"""TPU-exact headline benchmark: the Rule-Based scenario of the
reference's 5-policy benchmark (10 seeds x 200 steps), with per-step
rewards AND the cumulative return computed on-device in integer
soft-float.  Pass criterion: every bit pattern identical to the CPU
parity engine (itself verified bit-exact vs the reference).

Usage: python exact_tpu_benchmark.py tpu|cpu out.npz
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

mode, out_path = sys.argv[1], sys.argv[2]
if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import exact_dynamics as XD
from marl_sortingenv_tpu.core import state as S

print("backend:", jax.devices()[0].platform, flush=True)
cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)

cums, rews = [], []
for seed in range(1, 11):
    st = S.reset(cfg, seed)
    _, outs, cum_bits = XD.rollout_rule_exact(cfg, st, 200)
    cums.append(np.uint64(int(cum_bits)))
    rews.append(np.asarray(outs["reward_bits"]))
    val = np.array([cums[-1]]).view(np.float64)[0]
    print(f"seed {seed}: cumulative = {val!r}", flush=True)

cums = np.asarray(cums)
vals = cums.view(np.float64)
print(f"Rule-Based over 10 seeds: {vals.mean():.2f} +/- {vals.std():.2f}",
      flush=True)
np.savez(out_path, cum_bits=cums, reward_bits=np.stack(rews))
