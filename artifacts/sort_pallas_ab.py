"""A/B the fused Pallas _sort_material kernel vs the XLA path on the
real TPU: (1) bitwise equivalence of outputs + new key, (2) kernel-level
timing via an on-device dependency-chained scan, (3) full-step closed
loop throughput with the kernel patched into fastb._sort_material.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax import lax
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fastb as FB
from marl_sortingenv_tpu.ops import sort_pallas as SP

N_ENVS = 4096
N_STEPS = 256
cfg = load_config(bale_mode="events")
I32, F32 = jnp.int32, jnp.float32
support = FB._support_for(cfg)
print("platform:", jax.devices()[0].platform, "support:", support)

st = FB.reset_batch(cfg, jax.random.PRNGKey(0), N_ENVS)
stepped = FB.with_autoreset(cfg, lambda c, s, a: FB.step_mono_rule(c, s))
for _ in range(3):
    st, _ = jax.jit(stepped)(st, jnp.zeros(N_ENVS, jnp.int32))

# --- 1. bitwise equivalence on device ---
def xla_path(counts, acc, key):
    us = []
    for _ in range(4):
        ks = FB._vsplit(key)
        key, sk = ks[:, 0], ks[:, 1]
        k3 = FB._vsplit(sk, 3)
        us.extend(FB._vuniform(k3[:, j]) for j in range(3))
    lo, t, f = FB.redistribute_u(counts, acc, jnp.stack(us), support)
    return lo, t, f, key

lo_x, t_x, f_x, k_x = jax.jit(xla_path)(st.sort_counts, st.acc_sorter, st.key)
lo_p, t_p, f_p, k_p = SP.sort_material_fused(
    st.sort_counts, st.acc_sorter, st.key, support=support)
ok = all(bool((a == b).all()) for a, b in
         [(lo_x, lo_p), (t_x, t_p), (f_x, f_p), (k_x, k_p)])
print("TPU bitwise equivalence:", "PASS" if ok else "FAIL")
if not ok:
    for name, a, b in [("leftover", lo_x, lo_p), ("true", t_x, t_p),
                       ("false", f_x, f_p), ("key", k_x, k_p)]:
        d = int((np.asarray(a) != np.asarray(b)).sum())
        print(f"  {name}: {d} mismatched elements")
    sys.exit(1)

# --- 2. kernel-level timing: chained on-device scan ---
def time_scan(fn, counts, acc, key, iters=512):
    def body(carry, _):
        counts, key = carry
        lo, t, f, key = fn(counts, acc, key)
        # data-dependent perturbation so the loop can't be hoisted
        counts = jnp.maximum(counts - (lo + t + f) * 0 + (t.sum() % 2), 1)
        return (counts, key), ()

    run = jax.jit(lambda c, k: lax.scan(body, (c, k), None, length=iters)[0])
    out = run(counts, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(counts, key)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6

us_xla = time_scan(xla_path, st.sort_counts, st.acc_sorter, st.key)
us_pal = time_scan(
    lambda c, a, k: SP.sort_material_fused(c, a, k, support=support),
    st.sort_counts, st.acc_sorter, st.key)
print(f"sort core: XLA {us_xla:8.2f} us   Pallas {us_pal:8.2f} us   "
      f"speedup {us_xla/us_pal:.2f}x")

# --- 3. full closed-loop step with the kernel patched in ---
orig = FB._sort_material


def sort_pallas_patched(cfg_, s):
    total_input = s.sort_counts.sum(axis=0)
    lo, t, f, key = SP.sort_material_fused(
        s.sort_counts, s.acc_sorter, s.key, support=FB._support_for(cfg_))
    e_input = lo.sum(axis=0).astype(I32)
    cont_true = s.cont_true.at[:4].add(t)
    cont_true = cont_true.at[4].add(e_input)
    purity = jnp.where(
        total_input > 0,
        1.0 - (total_input - t.sum(axis=0)).astype(F32)
        / jnp.maximum(total_input, 1).astype(F32), 0.0)
    return purity, s._replace(cont_true=cont_true,
                              cont_false=s.cont_false + f, key=key)


def build_run():
    st0 = FB.reset_batch(cfg, jax.random.PRNGKey(0), N_ENVS)
    stp = FB.with_autoreset(cfg, lambda c, s, a: FB.step_mono_rule(c, s))

    def body(s, _):
        s, out = stp(s, jnp.zeros(N_ENVS, jnp.int32))
        return s, out.reward.sum() + out.obs.sum()

    return jax.jit(lambda s: lax.scan(body, s, None, length=N_STEPS)[1]), st0


def t_run(run, s0, reps=3):
    out = run(s0)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(s0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return N_ENVS * N_STEPS / best


run, st0 = build_run()
base = t_run(run, st0)
FB._sort_material = sort_pallas_patched
run, st0 = build_run()
fused = t_run(run, st0)
# bitwise check of full-step trajectories
FB._sort_material = orig
run_a, _ = build_run()
FB._sort_material = sort_pallas_patched
run_b, _ = build_run()
tr_a, tr_b = run_a(st0), run_b(st0)
same = bool((np.asarray(tr_a) == np.asarray(tr_b)).all())
FB._sort_material = orig
print(f"full step: XLA {base/1e6:7.2f}M steps/s   Pallas {fused/1e6:7.2f}M "
      f"steps/s   ({fused/base:.2f}x)   trajectories bitwise: "
      f"{'PASS' if same else 'FAIL'}")
