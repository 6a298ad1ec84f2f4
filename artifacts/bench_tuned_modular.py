import json
import sys

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_platforms", "cpu")

from marl_sortingenv_tpu.config.config import SimConfig
from marl_sortingenv_tpu.eval import harness
from marl_sortingenv_tpu.models import mlp
from marl_sortingenv_tpu.utils import checkpoint as CK

cfg = SimConfig()
key = jax.random.PRNGKey(0)
sort_params = CK.load_model(
    "/root/repo/artifacts/models_masked/PPO_Sorting_Masked_100000.npz",
    mlp.init_params(key, 13, 2))
press_params = CK.load_model(
    "/root/repo/artifacts/press_sweep_lr1e-3_ent0.01.npz",
    mlp.init_params(key, 16, 11))
mono_params = CK.load_model(
    "/root/repo/artifacts/models_masked/PPO_Monolith_Masked_100000.npz",
    mlp.init_params(key, 29, 22))

summary, rows = harness.run_model_benchmark(
    cfg, num_seeds=10, steps=200, sort_params=sort_params,
    press_params=press_params, mono_params=mono_params,
    use_action_masking=True, print_table=True)
print(json.dumps(summary, indent=2), flush=True)
with open("/root/repo/artifacts/benchmark_tuned_modular.json", "w") as f:
    json.dump({"summary": summary, "rows": rows}, f, indent=2)
