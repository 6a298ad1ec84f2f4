"""TPU-vs-CPU bit validation for the exact engine at noise_sorting=0.05
(the reference DEFAULT config): obs f32 bits, reward f64 bits, and the
exact accuracy IEEE bits over 100-step episodes (VERDICT r1 Missing #4).

Usage: python exact_tpu_noise.py tpu|cpu out.npz
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

mode, out_path = sys.argv[1], sys.argv[2]
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import exact_dynamics as XD
from marl_sortingenv_tpu.core import state as S

print("backend:", jax.devices()[0].platform, flush=True)
cfg = load_config(max_steps=200, noise_sorting=0.05, balesize=200)
STEPS, SEED = 100, 42
rng = np.random.default_rng(99)

CASES = {
    "mono_rule": (lambda s, a: XD.step_mono_rule_exact(cfg, s),
                  np.zeros(STEPS, np.int64)),
    "mono_ext_unmasked": (
        lambda s, a: XD.step_mono_external_exact(cfg, s, a, False),
        rng.integers(0, 22, STEPS)),
    "sort": (lambda s, a: XD.step_sort_exact(cfg, s, a),
             rng.integers(0, 2, STEPS)),
}

out = {}
for name, (step, actions) in CASES.items():
    if only and name not in only:
        continue
    st = S.reset(cfg, SEED)

    def body(st, a):
        st, o = step(st, a)
        return st, (o["obs"], o["reward_bits"], st.acc_belt_bits)

    _, (obs, rbits, abits) = jax.jit(
        lambda st, acts: lax.scan(body, st, acts))(
        st, jnp.asarray(actions, jnp.int32))
    out[f"{name}_obs"] = np.asarray(obs).view(np.uint32)
    out[f"{name}_rew"] = np.asarray(rbits)
    out[f"{name}_acc"] = np.asarray(abits)
    print(f"{name}: done", flush=True)

np.savez(out_path, **out)
print("saved", out_path, flush=True)
