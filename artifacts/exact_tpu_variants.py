"""TPU-vs-CPU bit validation for ALL exact step variants (Env_1, Env_2
masked/unmasked, external monolith masked/unmasked): obs f32 bits and
reward f64 bits over 100-step episodes.

Usage: python exact_tpu_variants.py tpu|cpu out.npz
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
cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)
STEPS, SEED = 100, 42
rng = np.random.default_rng(99)

CASES = {
    "sort": (lambda s, a: XD.step_sort_exact(cfg, s, a),
             rng.integers(0, 2, STEPS)),
    "press_masked": (lambda s, a: XD.step_press_exact(cfg, s, a, True),
                     np.zeros(STEPS, np.int64)),
    "press_unmasked": (lambda s, a: XD.step_press_exact(cfg, s, a, False),
                       rng.integers(0, 11, STEPS)),
    "mono_ext_masked": (
        lambda s, a: XD.step_mono_external_exact(cfg, s, a, True),
        np.zeros(STEPS, np.int64)),
    "mono_ext_unmasked": (
        lambda s, a: XD.step_mono_external_exact(cfg, s, a, False),
        rng.integers(0, 22, STEPS)),
}

out = {}
for name, (step, actions) in CASES.items():
    if only and name not in only:
        continue
    st = S.reset(cfg, SEED)

    def body(st, a):
        st, o = step(st, a)
        return st, (o["obs"], o["reward_bits"])

    _, (obs, rbits) = jax.jit(
        lambda st, acts: lax.scan(body, st, acts))(
        st, jnp.asarray(actions, jnp.int32))
    out[f"{name}_obs"] = np.asarray(obs).view(np.uint32)
    out[f"{name}_rew"] = np.asarray(rbits)
    print(f"{name}: done", flush=True)

np.savez(out_path, **out)
print("saved", out_path, flush=True)
