import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from jax import lax
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fastb as FB

N, STEPS = 65536, 256
res = {}
for kernel in ("pallas", "xla"):
    cfg = load_config(bale_mode="events", sort_kernel=kernel)
    st = FB.reset_batch(cfg, jax.random.PRNGKey(0), N)
    stepped = FB.with_autoreset(cfg, lambda c, s, a: FB.step_mono_rule(c, s))
    def body(st, _):
        st, out = stepped(st, jnp.zeros(N, jnp.int32))
        return st, out.reward.sum()
    run = jax.jit(lambda st: lax.scan(body, st, None, length=STEPS))
    t0 = time.perf_counter()
    stf, r = run(st)
    res[kernel] = (np.asarray(r), np.asarray(stf.cont_true))
    print(f"{kernel} first call+compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        c = stf
        for _ in range(4):
            c, r2 = run(c)
        np.asarray(r2[-1])
        best = max(best, 4*N*STEPS/(time.perf_counter()-t0))
    print(f"{kernel:6s} 65536 envs: {best/1e6:7.1f}M env-steps/s", flush=True)
print("bitwise rewards equal:", np.array_equal(res["pallas"][0], res["xla"][0]),
      "| cont_true equal:", np.array_equal(res["pallas"][1], res["xla"][1]))
