"""A/B: Pallas sort_redistribute vs fastb.redistribute_u on the real TPU.

Measures the isolated redistribution op at B=4096 (the bench config) and
checks bitwise equivalence on-device. Run bare: `python artifacts/pallas_ab2.py`.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/marl_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from marl_sortingenv_tpu.core import fastb
from marl_sortingenv_tpu.ops import mvhg_pallas

B = 4096
SUPPORT = 104
rng = np.random.default_rng(0)
counts = rng.integers(0, 40, size=(B, 4)).astype(np.int32)
acc = rng.uniform(0.7, 1.0, size=(B, 4)).astype(np.float32)
us = rng.random(size=(B, 12)).astype(np.float32)

dev = jax.devices()[0]
print("device:", dev)

c_r = jax.device_put(jnp.asarray(counts), dev)      # (B,4) row layout
a_r = jax.device_put(jnp.asarray(acc), dev)
u_r = jax.device_put(jnp.asarray(us), dev)
c_c = jax.device_put(jnp.asarray(counts.T), dev)    # (4,B) batch-last
a_c = jax.device_put(jnp.asarray(acc.T), dev)
u_c = jax.device_put(jnp.asarray(us.T), dev)


@jax.jit
def xla_path(c, a, u):
    return fastb.redistribute_u(c, a, u, support=SUPPORT)


def pallas_path(c, a, u, env_tile):
    return mvhg_pallas.sort_redistribute(c, a, u, support=SUPPORT,
                                         env_tile=env_tile)


def timeit(fn, c, a, u, iters=200):
    """Pure device time via an on-device scan: each iteration's u depends
    on the previous output (tiny data-dependent perturbation), so XLA
    cannot hoist or CSE the body out of the loop and Python dispatch is
    paid once (round-2 ADVICE: chaining 200 async dispatches measured
    Python dispatch, not device time, for sub-100us ops)."""
    from jax import lax

    def body(u, _):
        _, t, _ = fn(c, a, u)
        eps = (t.sum() % 2).astype(jnp.float32) * jnp.float32(1e-12)
        return u + eps, ()

    run = jax.jit(lambda u: lax.scan(body, u, None, length=iters)[0])
    out = run(u)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(u)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6  # us


lx, tx, fx = xla_path(c_c, a_c, u_c)
us_xla = timeit(xla_path, c_c, a_c, u_c)
print(f"XLA   redistribute_u  : {us_xla:9.1f} us/call  ({B/us_xla*1e6/1e6:.1f}M env/s)")

for tile in (8, 16, 32, 64, 128, 256, 512):
    try:
        lp, tp, fp = pallas_path(c_r, a_r, u_r, tile)
        ok = (np.array_equal(np.asarray(lp).T, np.asarray(lx))
              and np.array_equal(np.asarray(tp).T, np.asarray(tx))
              and np.array_equal(np.asarray(fp).T, np.asarray(fx)))
        us_p = timeit(
            lambda c, a, u, t=tile: pallas_path(c, a, u, t), c_r, a_r, u_r)
        print(f"Pallas tile={tile:4d}      : {us_p:9.1f} us/call  "
              f"({B/us_p*1e6/1e6:.1f}M env/s)  bitwise_eq={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"Pallas tile={tile:4d}      : FAILED {type(e).__name__}: {e}")
