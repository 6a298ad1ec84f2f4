"""Split-timing of the PPO train iteration on the TPU: rollout scan vs
GAE vs update epochs, to find the learner-attached throughput bottleneck.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo

N_ENVS = 4096
pcfg = ppo.PPOConfig(n_steps=64, batch_size=16384, n_epochs=4)
cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)
spec = ppo.spec_for("mono", engine="fastb")

ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N_ENVS, seed=0)
step_fn = spec.step_fn(use_action_masking=True)


@jax.jit
def rollout_only(ts):
    ts, trs, last_value = ppo.collect_rollout(cfg, pcfg, spec, ts, step_fn)
    return ts, trs, last_value


@jax.jit
def gae_only(trs, last_value):
    return ppo.compute_gae(pcfg, trs, last_value)


@jax.jit
def update_only(ts, trs, adv, ret):
    return ppo.ppo_update(pcfg, ts, trs, adv, ret)


def t(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


dt_r, (ts2, trs, lv) = t(rollout_only, ts)
dt_g, (adv, ret) = t(gae_only, trs, lv)
dt_u, _ = t(update_only, ts2, trs, adv, ret)

steps = N_ENVS * pcfg.n_steps
print(f"rollout: {dt_r*1e3:8.2f} ms  ({steps/dt_r/1e6:6.2f}M steps/s)")
print(f"gae:     {dt_g*1e3:8.2f} ms")
print(f"update:  {dt_u*1e3:8.2f} ms  "
      f"({pcfg.n_epochs * (steps // pcfg.batch_size)} grad steps)")
tot = dt_r + dt_g + dt_u
print(f"total:   {tot*1e3:8.2f} ms  ({steps/tot/1e6:6.2f}M env-steps/s)")
