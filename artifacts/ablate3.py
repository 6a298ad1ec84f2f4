"""Round-3b: stage ablation of step_mono_rule in EVENT bale mode, timed
with bench.py's chained-dispatch methodology (the per-call-sync timing of
profile_step_ablate.py under-reports absolute rates on the tunneled
client; rankings only).  Finds the next bottleneck after the bale
event-sourcing win."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

import bench
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fastb as FB

N_ENVS = 4096
N_STEPS = 512
cfg = load_config(bale_mode="events")


def build_run():
    st = FB.reset_batch(cfg, jax.random.PRNGKey(0), N_ENVS)
    stepped = FB.with_autoreset(cfg, lambda c, s, a: FB.step_mono_rule(c, s))

    def body(st, _):
        st, out = stepped(st, jnp.zeros(N_ENVS, jnp.int32))
        return st, out.reward.sum() + out.obs.sum()  # keep obs live (DCE)

    return jax.jit(lambda s: lax.scan(body, s, None, length=N_STEPS)), st


base_fns = {
    "_press_bale": FB._press_bale,
    "_sort_material": FB._sort_material,
    "_update_environment": FB._update_environment,
    "_update_accuracy": FB._update_accuracy,
    "_press_reward": FB._press_reward,
    "_sorting_reward": FB._sorting_reward,
    "get_mono_obs": FB.get_mono_obs,
    "autoreset": FB.autoreset,
}
noops = {
    "_press_bale": lambda cfg, st, m, n, q, pred: st,
    "_sort_material": lambda cfg, st: (jnp.zeros(N_ENVS, jnp.float32), st),
    "_update_environment": lambda cfg, st: st,
    "_update_accuracy": lambda cfg, st: st,
    "_press_reward": lambda cfg, st: (jnp.zeros(N_ENVS, jnp.float32), st),
    "_sorting_reward": lambda cfg, st: jnp.zeros(N_ENVS, jnp.float32),
    "get_mono_obs": lambda cfg, st: jnp.zeros((N_ENVS, 29), jnp.float32),
    "autoreset": lambda cfg, st: st,
}


def rate(run, st):
    def r(s):
        s, out = run(s)
        return s, out[-1]
    return bench._time_chain(r, st, N_ENVS * N_STEPS, chain=4, repeats=3)


run, st = build_run()
full = rate(run, st)
print(f"full step (events)   : {full/1e6:7.2f}M steps/s", flush=True)
for name in base_fns:
    setattr(FB, name, noops[name])
    try:
        run, st0 = build_run()
        r = rate(run, st0)
        print(f"minus {name:19s}: {r/1e6:7.2f}M steps/s   "
              f"saved {100*(1/full - 1/r)/(1/full):5.1f}% of step time",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"minus {name}: FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        setattr(FB, name, base_fns[name])
