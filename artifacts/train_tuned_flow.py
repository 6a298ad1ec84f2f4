"""Full tuned 3-stage training flow at the 100k protocol budget (TPU),
saving models for the CPU benchmark step."""
import sys

sys.path.insert(0, "/root/repo")

import jax

from marl_sortingenv_tpu.config.config import SimConfig
from marl_sortingenv_tpu.learn.trainer import train_agent

cfg = SimConfig()
d = "/root/repo/artifacts/models_tuned"

sort_res = train_agent(cfg, "sort", 100_000, n_envs=16, tuned=True,
                       models_dir=d, save_prefix="PPO_Sorting_Tuned")
press_res = train_agent(cfg, "press", 100_000, n_envs=16, tuned=True,
                        sort_params=sort_res.params, models_dir=d,
                        save_prefix="PPO_Pressing_Tuned")
mono_res = train_agent(cfg, "mono", 100_000, n_envs=16, tuned=True,
                       models_dir=d, save_prefix="PPO_Monolith_Tuned")
print("DONE", sort_res.final_eval_mean, press_res.final_eval_mean,
      mono_res.final_eval_mean, flush=True)
