"""Decompose the jitted PPO train iteration wall time at 4096 envs:
vary n_epochs (0,1,2,4) to get the per-epoch update cost by slope, and
time the rollout/GAE prefix alone.  Chained-dispatch timing (one host
fence), as bench.py.
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
from marl_sortingenv_tpu.learn import ppo

N_ENVS = 4096
cfg = load_config(bale_mode="events")
CHAIN = 16


def time_chain(run, carry):
    carry, s = run(carry)
    np.asarray(s)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        c = carry
        for _ in range(CHAIN):
            c, s = run(c)
        np.asarray(s)
        best = min(best, (time.perf_counter() - t0) / CHAIN)
        carry = c
    return best


spec = ppo.spec_for("mono", engine="fastb")
for epochs in (0, 1, 2, 4):
    pcfg = ppo.PPOConfig(n_steps=64, batch_size=16384, n_epochs=epochs,
                         shuffle_block=128)
    ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N_ENVS, seed=0)
    it = ppo.make_train_iteration(cfg, pcfg, spec)

    def run(ts):
        ts, stats = it(ts)
        return ts, stats["loss"]

    ms = time_chain(run, ts) * 1e3
    print(f"n_epochs={epochs}: {ms:7.2f} ms/iter   "
          f"({N_ENVS*64/ms*1e3/1e6:6.2f}M env-steps/s)")

# rollout + GAE only
pcfg = ppo.PPOConfig(n_steps=64, batch_size=16384, n_epochs=4,
                     shuffle_block=128)
ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N_ENVS, seed=0)
step_fn = spec.step_fn(None, True)


def roll_gae(ts):
    ts, trs, last_value = ppo.collect_rollout(cfg, pcfg, spec, ts, step_fn,
                                              True)
    adv, ret = ppo.compute_gae(pcfg, trs, last_value)
    return ts, adv.sum() + ret.sum()


runr = jax.jit(roll_gae)
ms = time_chain(runr, ts) * 1e3
print(f"rollout+GAE only: {ms:7.2f} ms")


def roll_only(ts):
    ts, trs, last_value = ppo.collect_rollout(cfg, pcfg, spec, ts, step_fn,
                                              True)
    return ts, trs.reward.sum() + last_value.sum()


runo = jax.jit(roll_only)
ms = time_chain(runo, ts) * 1e3
print(f"rollout only:     {ms:7.2f} ms")
