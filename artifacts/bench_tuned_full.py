import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from marl_sortingenv_tpu.config.config import SimConfig
from marl_sortingenv_tpu.eval import harness
from marl_sortingenv_tpu.models import mlp
from marl_sortingenv_tpu.utils import checkpoint as CK

cfg = SimConfig()
key = jax.random.PRNGKey(0)
d = "/root/repo/artifacts/models_tuned"
sp = CK.load_model(f"{d}/PPO_Sorting_Tuned_100000.npz", mlp.init_params(key, 13, 2))
pp = CK.load_model(f"{d}/PPO_Pressing_Tuned_100000.npz", mlp.init_params(key, 16, 11))
mp = CK.load_model(f"{d}/PPO_Monolith_Tuned_100000.npz", mlp.init_params(key, 29, 22))
summary, rows = harness.run_model_benchmark(
    cfg, num_seeds=10, steps=200, sort_params=sp, press_params=pp,
    mono_params=mp, use_action_masking=True, print_table=True)
print(json.dumps(summary, indent=2), flush=True)
with open("/root/repo/artifacts/benchmark_tuned_full.json", "w") as f:
    json.dump({"summary": summary, "rows": rows}, f, indent=2)
