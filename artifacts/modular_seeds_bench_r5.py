"""Benchmark the PPO-Modular (masked) cell for each training seed's saved
default-preset sort+press pair (parity engine, env seeds 1..10)."""
import sys, json, glob, re
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.eval import harness
from marl_sortingenv_tpu.models import mlp
from marl_sortingenv_tpu.utils import checkpoint as CK

cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)
d = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/artifacts/modular_seeds_r5"
seeds = sorted({int(m.group(1)) for f in glob.glob(f"{d}/s*_PPO_Sorting_*.npz")
                if (m := re.search(r"s(\d+)_PPO_Sorting", f))})
out = {}
for ts in seeds:
    sp = CK.load_model(CK.find_latest_model(f"s{ts}_PPO_Sorting", d),
                       mlp.init_params(jax.random.PRNGKey(0), 13, 2))
    pp = CK.load_model(CK.find_latest_model(f"s{ts}_PPO_Pressing", d),
                       mlp.init_params(jax.random.PRNGKey(0), 16, 11))
    vals = [harness.run_episode(cfg, s, 200, "model", sort_params=sp,
                                press_params=pp,
                                use_action_masking=True).cumulative_reward
            for s in range(1, 11)]
    v = np.asarray(vals)
    out[ts] = {"mean": float(v.mean()), "std": float(v.std()),
               "per_seed": [float(x) for x in v]}
    print(f"train seed {ts}: modular {v.mean():7.2f} +/- {v.std():.2f}",
          flush=True)
means = np.asarray([o["mean"] for o in out.values()])
print(f"across {len(seeds)} training seeds: {means.mean():.2f} "
      f"(min {means.min():.2f}, max {means.max():.2f})", flush=True)
with open(f"{d}/modular_cells.json", "w") as f:
    json.dump(out, f, indent=2)
