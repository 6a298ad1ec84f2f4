"""CPU<->TPU bit-identity of the frozen-policy exact step paths
(models.mlp_exact integer policy inside core.exact_dynamics):

* Env_2_Pressing with the frozen integer sort agent (config-3 surface),
  200-step episode, always-valid no-op press actions + a masked pattern;
* Monolith 'model' path = the PPO Modular benchmark scenario (both
  agents) and PPO Sort-Only (sort agent + rng_pressing fallback),
  200 steps.

Pass criterion: every fetched bit identical between backends — actions,
sort modes, obs (f32 bits), rewards (f64 bits via soft-float), press
logs, final integer state.

Usage: python mlp_exact_tpu.py tpu|cpu out.npz ; then compare.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

mode, out_path = sys.argv[1], sys.argv[2]
if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import exact_dynamics as XD
from marl_sortingenv_tpu.core import state as S
from marl_sortingenv_tpu.models import mlp, mlp_exact as MX
from marl_sortingenv_tpu.utils import checkpoint as CK

print("backend:", jax.devices()[0].platform, flush=True)
cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)
d = "/root/repo/artifacts/models_masked"
sp = CK.load_model(CK.find_latest_model("PPO_Sorting_Masked", d),
                   mlp.init_params(jax.random.PRNGKey(0), 13, 2))
pp = CK.load_model(CK.find_latest_model("PPO_Pressing_Masked", d),
                   mlp.init_params(jax.random.PRNGKey(0), 16, 11))
q_sort, q_press = MX.quantize_policy(sp), MX.quantize_policy(pp)

out = {}


def scan_steps(step, st, n):
    def body(st, _):
        st, o = step(st)
        return st, o
    return jax.jit(lambda st: lax.scan(body, st, None, length=n))(st)


# 1) Env_2 frozen-sort episode (no-op press: action 0 is always valid)
st, outs = scan_steps(
    lambda st: XD.step_press_model_exact(cfg, st, jnp.int32(0), q_sort, True),
    S.reset(cfg, 42), 200)
out["press_actions"] = np.asarray(outs["sort_mode"])
out["press_obs_bits"] = np.asarray(outs["obs"]).view(np.uint32)
out["press_reward_bits"] = np.asarray(outs["reward_bits"])
out["press_log"] = np.asarray(outs["press_log"])
out["press_cont_true"] = np.asarray(st.cont_true)

# 2) PPO Modular scenario (both agents) and PPO Sort-Only (fallback)
for tag, qp in (("modular", q_press), ("sortonly", None)):
    st, outs = scan_steps(
        lambda st: XD.step_mono_model_exact(cfg, st, q_sort, qp, True),
        S.reset(cfg, 7), 200)
    out[f"{tag}_actions"] = np.asarray(outs["action"])
    out[f"{tag}_obs_bits"] = np.asarray(outs["obs"]).view(np.uint32)
    out[f"{tag}_reward_bits"] = np.asarray(outs["reward_bits"])
    out[f"{tag}_cont_true"] = np.asarray(st.cont_true)
    out[f"{tag}_bale_cnt"] = np.asarray(st.bale_cnt)

# 3) PPO Monolith scenario (monolith agent, masked predict, external path)
mp = CK.load_model(CK.find_latest_model("PPO_Monolith_Masked", d),
                   mlp.init_params(jax.random.PRNGKey(0), 29, 22))
q_mono = MX.quantize_policy(mp)
st, outs = scan_steps(
    lambda st: XD.step_mono_policy_exact(cfg, st, q_mono, True),
    S.reset(cfg, 5), 200)
out["mono_actions"] = np.asarray(outs["action"])
out["mono_obs_bits"] = np.asarray(outs["obs"]).view(np.uint32)
out["mono_reward_bits"] = np.asarray(outs["reward_bits"])
out["mono_cont_true"] = np.asarray(st.cont_true)

np.savez(out_path, **out)
print("saved", out_path, flush=True)
if len(sys.argv) > 3:
    ref = np.load(sys.argv[3])
    ok = True
    for k in out:
        same = np.array_equal(out[k], ref[k])
        print(f"{k:>22}: {'BITWISE-EQUAL' if same else 'MISMATCH'}",
              flush=True)
        ok &= same
    print("RESULT:", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)
