"""Throughput benchmark: env-steps/s per chip on Env_3_Monolith, 4096
lockstep instances (the BASELINE.json metric).

Runs the batch-last fast TPU engine (core.fastb: f32/i32/threefry,
struct-of-arrays with the env batch on the 128-lane axis; bit-identical
trajectories to the vmapped per-env fast engine — the tunneled TPU emulates
f64 at reduced precision, so the bit-exact parity engine is CPU-verified
by the test suite while this measures the production path) stepping the
closed-loop rule-based monolith under one jitted scan.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "env_steps_per_sec", "vs_baseline": N}
vs_baseline is value / 1e6 (the >=1M env-steps/s/host target).
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fastb as FB

N_ENVS = 4096
N_STEPS = 512
REPEATS = 3
BASELINE = 1_000_000.0  # >=1M env-steps/s/host (BASELINE.json north star)


def main():
    cfg = load_config()
    st = FB.reset_batch(cfg, jax.random.PRNGKey(0), N_ENVS)
    stepped = FB.with_autoreset(cfg, lambda c, s, a: FB.step_mono_rule(c, s))

    def body(st, _):
        st, out = stepped(st, jnp.zeros(N_ENVS, jnp.int32))
        return st, out.reward.sum()

    run = jax.jit(lambda st: lax.scan(body, st, None, length=N_STEPS))

    # compile + warmup
    st, r = run(st)
    jax.block_until_ready(r)

    best = 0.0
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        st, r = run(st)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        best = max(best, N_ENVS * N_STEPS / dt)

    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip_mono4096",
        "value": round(best, 1),
        "unit": "env_steps_per_sec",
        "vs_baseline": round(best / BASELINE, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
