"""Benchmark trained flagship agents on the parity engine (CPU): the
5-policy x 10-seed table comparable to BASELINE.md published numbers."""
import sys, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.eval import harness
from marl_sortingenv_tpu.models import mlp
from marl_sortingenv_tpu.utils import checkpoint as CK

cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)
out = {}
for tag in ("masked", "nomask"):
    d = f"/root/repo/artifacts/models_{tag}"
    T = "Masked" if tag == "masked" else "NoMask"
    def load(prefix, od, na):
        p = CK.find_latest_model(f"{prefix}_{T}", d)
        if p is None:
            return None
        return CK.load_model(p, mlp.init_params(jax.random.PRNGKey(0), od, na))
    sp = load("PPO_Sorting", 13, 2)
    pp = load("PPO_Pressing", 16, 11)
    mp = load("PPO_Monolith", 29, 22)
    if sp is None or pp is None or mp is None:
        print(f"{tag}: models missing, skipping", flush=True)
        continue
    summary, rows = harness.run_model_benchmark(
        cfg, num_seeds=10, steps=200, sort_params=sp, press_params=pp,
        mono_params=mp, use_action_masking=(tag == "masked"))
    out[tag] = summary
    print(f"== {tag} ==", flush=True)
    for k, v in summary.items():
        print(f"  {k:>14}: {v['mean']:8.2f} ± {v['std']:.2f}", flush=True)
with open("/root/repo/artifacts/benchmark_results.json", "w") as f:
    json.dump(out, f, indent=2)
