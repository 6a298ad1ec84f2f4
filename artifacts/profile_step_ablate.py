"""Ablate step_mono_rule components on the TPU to find the next bottleneck.

Monkeypatches individual stages of core.fastb to no-ops and measures the
closed-loop rule-based scan (the bench.py headline shape) at 4096 envs.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax import lax
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fastb as FB

N_ENVS = 4096
N_STEPS = 256
cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)


def build_run():
    st = FB.reset_batch(cfg, jax.random.PRNGKey(0), N_ENVS)
    stepped = FB.with_autoreset(cfg, lambda c, s, a: FB.step_mono_rule(c, s))

    def body(st, _):
        st, out = stepped(st, jnp.zeros(N_ENVS, jnp.int32))
        # keep obs live (reward alone lets XLA dead-code-eliminate
        # get_mono_obs from the baseline, so the obs ablation row would
        # measure nothing — round-2 ADVICE)
        return st, out.reward.sum() + out.obs.sum()

    return jax.jit(lambda s: lax.scan(body, s, None, length=N_STEPS)[1]), st


def t(run, st, reps=3):
    out = run(st)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(st)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


base_fns = {
    "_press_bale": FB._press_bale,
    "_sort_material": FB._sort_material,
    "_update_environment": FB._update_environment,
    "_update_accuracy": FB._update_accuracy,
    "_press_reward": FB._press_reward,
    "_sorting_reward": FB._sorting_reward,
    "get_mono_obs": FB.get_mono_obs,
}

noops = {
    "_press_bale": lambda cfg, st, m, n, q, pred: st,
    "_sort_material": lambda cfg, st: (jnp.zeros(N_ENVS, jnp.float32), st),
    "_update_environment": lambda cfg, st: st,
    "_update_accuracy": lambda cfg, st: st,
    "_press_reward": lambda cfg, st: (jnp.zeros(N_ENVS, jnp.float32), st),
    "_sorting_reward": lambda cfg, st: jnp.zeros(N_ENVS, jnp.float32),
    "get_mono_obs": lambda cfg, st: jnp.zeros((N_ENVS, 29), jnp.float32),
}

run, st = build_run()
full = t(run, st)
print(f"full step          : {full*1e3:8.2f} ms "
      f"({N_ENVS*N_STEPS/full/1e6:6.2f}M steps/s)")

for name in base_fns:
    setattr(FB, name, noops[name])
    try:
        run, st0 = build_run()
        dt = t(run, st0)
        print(f"minus {name:17s}: {dt*1e3:8.2f} ms "
              f"({N_ENVS*N_STEPS/dt/1e6:6.2f}M steps/s)  "
              f"saved {100*(full-dt)/full:5.1f}%")
    except Exception as e:  # noqa: BLE001
        print(f"minus {name}: FAILED {type(e).__name__}: {e}")
    finally:
        setattr(FB, name, base_fns[name])
