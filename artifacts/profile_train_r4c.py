"""Variant timing for the round-4 update work: full train iteration at
8192 envs, wall-clock chained (bench.py methodology), across candidate
configs.  Wall is what BENCH records, so decisions are made on wall.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo

N = 8192
T = 64
CHAIN = 16


def time_chain(run, carry, repeats=3):
    carry, s = run(carry)
    np.asarray(s)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = carry
        for _ in range(CHAIN):
            c, s = run(c)
        np.asarray(s)
        best = min(best, (time.perf_counter() - t0) / CHAIN)
        carry = c
    return best


def bench(label, batch, epochs=4, shuffle_block=128, ru=1, mu=1,
          donate=False):
    cfg = load_config(bale_mode="events")
    pcfg = ppo.PPOConfig(n_steps=T, batch_size=batch, n_epochs=epochs,
                         shuffle_block=shuffle_block,
                         rollout_unroll=ru, mb_unroll=mu)
    spec = ppo.spec_for("mono", engine="fastb")
    ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N, seed=0)
    it = ppo.make_train_iteration(cfg, pcfg, spec, donate=donate)

    def run(ts):
        ts, stats = it(ts)
        return ts, stats["loss"]

    dt = time_chain(run, ts)
    print(f"{label:28s} {dt*1e3:8.2f} ms/iter  "
          f"{N*T/dt/1e6:7.1f}M steps/s  {1/dt:6.1f} up/s", flush=True)


if __name__ == "__main__":
    for arg in sys.argv[1:]:
        label, batch, epochs, ru, mu, dn = arg.split(",")
        try:
            bench(label, int(batch), int(epochs), ru=int(ru), mu=int(mu),
                  donate=bool(int(dn)))
        except Exception as e:
            print(f"{label:28s} FAILED: {type(e).__name__}: {e}",
                  flush=True)
