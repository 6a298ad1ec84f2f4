"""On-chip A/B for the fused FULL-STEP kernel (ops/step_pallas.py):
rule + external variants with fused autoreset, XLA vs kernel, bitwise
trajectory assert + throughput (bench.py chained-dispatch methodology).

    python artifacts/step_pallas_ab.py
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fastb as FB

N, STEPS = 4096, 512


def run_variant(variant, kernel):
    cfg = load_config(bale_mode="events", step_kernel=kernel)
    st = FB.reset_batch(cfg, jax.random.PRNGKey(0), N)
    stepped = FB.mono_autoreset_step(cfg, variant)
    acts = jnp.zeros(N, jnp.int32) + 12  # sort mode 1, press1 x A

    def body(st, _):
        st, out = stepped(st, acts)
        return st, out.reward.sum()

    run = jax.jit(lambda st: lax.scan(body, st, None, length=STEPS))
    t0 = time.perf_counter()
    stf, r = run(st)
    rr = np.asarray(r)
    compile_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        c = stf
        for _ in range(8):
            c, r2 = run(c)
        np.asarray(r2[-1])
        best = max(best, 8 * N * STEPS / (time.perf_counter() - t0))
    fp = (rr, np.asarray(stf.cont_true), np.asarray(stf.key),
          np.asarray(stf.ev_n), np.asarray(stf.ev_cnt),
          np.asarray(stf.current_step))
    return best, compile_s, fp


for variant in ("rule", "external"):
    res = {}
    for kernel in ("pallas", "xla"):
        sps, comp, fp = run_variant(variant, kernel)
        res[kernel] = fp
        print(f"{variant:8s} {kernel:6s} {sps/1e6:7.1f}M env-steps/s "
              f"(first call {comp:.1f}s)", flush=True)
    ok = all(np.array_equal(a, b) for a, b in zip(*res.values()))
    print(f"{variant:8s} bitwise (rewards/cont/key/events/step): {ok}",
          flush=True)
    assert ok
print("PASS")
