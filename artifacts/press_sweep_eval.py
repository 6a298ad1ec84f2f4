import glob
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from marl_sortingenv_tpu.config.config import SimConfig
from marl_sortingenv_tpu.learn import ppo
from marl_sortingenv_tpu.models import mlp
from marl_sortingenv_tpu.utils import checkpoint as CK

cfg = SimConfig()
key = jax.random.PRNGKey(0)
sort_like = mlp.init_params(key, 13, 2)
press_like = mlp.init_params(key, 16, 11)
sort_params = CK.load_model(
    "/root/repo/artifacts/models_masked/PPO_Sorting_Masked_100000.npz",
    sort_like)
sort_policy = (mlp.policy_logits, sort_params)
spec = ppo.spec_for("press", engine="fast")

for path in sorted(glob.glob("/root/repo/artifacts/press_sweep_*.npz")):
    params = CK.load_model(path, press_like)
    rets = np.asarray(ppo.evaluate(
        cfg, spec, params, n_envs=10, n_steps=cfg.max_steps, seed0=99,
        sort_policy=sort_policy, use_action_masking=True))
    name = path.split("press_sweep_")[1].removesuffix(".npz")
    print(f"{name:>18}: eval {rets.mean():7.2f} ± {rets.std():.2f}",
          flush=True)
