"""Press-agent hyperparameter sweep at the reference protocol budget
(100k timesteps, masked).  Goal: close the modular-masked gap
(ours 20.0 vs published 30.6) without exceeding the protocol budget.

Uses the already-trained 100k sorting agent (frozen, embedded in the env
step) so every run trains only the press policy.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from marl_sortingenv_tpu.config.config import SimConfig
from marl_sortingenv_tpu.learn import ppo
from marl_sortingenv_tpu.learn.trainer import train_agent
from marl_sortingenv_tpu.models import mlp
from marl_sortingenv_tpu.utils import checkpoint as CK

cfg = SimConfig()  # noise_sorting=0.0, balesize=200 (main.py:42-43 defaults)

key = jax.random.PRNGKey(0)
like = mlp.init_params(key, 13, 2)
sort_params = CK.load_model(
    "/root/repo/artifacts/models_masked/PPO_Sorting_Masked_100000.npz", like)

SWEEP = [
    ("control", dict(), dict(n_envs=16)),
    ("lr1e-3", dict(learning_rate=1e-3), dict(n_envs=16)),
    ("ent0.01", dict(ent_coef=0.01), dict(n_envs=16)),
    ("lr1e-3_ent0.01", dict(learning_rate=1e-3, ent_coef=0.01),
     dict(n_envs=16)),
    ("epochs20", dict(n_epochs=20), dict(n_envs=16)),
    ("gamma0.95", dict(gamma=0.95), dict(n_envs=16)),
    ("lr1e-3_epochs20", dict(learning_rate=1e-3, n_epochs=20),
     dict(n_envs=16)),
    ("nenvs32_lr1e-3", dict(learning_rate=1e-3), dict(n_envs=32)),
]

results = {}
for name, pkw, tkw in SWEEP:
    n_envs = tkw["n_envs"]
    n_steps = max(128, 2048 // n_envs)
    pcfg = ppo.PPOConfig(n_steps=n_steps, batch_size=64, **pkw)
    t0 = time.time()
    res = train_agent(
        cfg, "press", 100_000, n_envs=n_envs, use_action_masking=True,
        sort_params=sort_params, seed=42, engine="fast",
        eval_freq=20_000, eval_envs=10, save_prefix=None, pcfg=pcfg,
        verbose=False)
    dt = time.time() - t0
    results[name] = dict(final=res.final_eval_mean, std=res.final_eval_std,
                         secs=round(dt, 1))
    print(f"[{name}] eval {res.final_eval_mean:.2f} ± "
          f"{res.final_eval_std:.2f}  ({dt:.0f}s)", flush=True)
    # keep params of every run for later benchmarking of the winner
    CK.save_pytree(f"/root/repo/artifacts/press_sweep_{name}.npz", res.params)

print(json.dumps(results, indent=2))
best = max(results, key=lambda k: results[k]["final"])
print("BEST:", best, results[best])
