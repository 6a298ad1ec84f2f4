"""Action-level TPU parity for MODEL paths (round-3 VERDICT item 8).

Frozen-MLP paths are CPU-parity only by design (f32 matmul+tanh is not
bit-portable CPU<->MXU, reference env_2_press.py:106-109 /
env_monolith.py:144-150).  What IS testable on the chip: do TPU-evaluated
policies pick the same argmax *actions* as the CPU over the benchmark
obs distribution?  Two measurements over the 10 benchmark seeds
(200-step episodes, benchmark config noise=0):

1. ``mono_closed``: closed-loop monolith episodes on the EXACT engine —
   action_t = argmax(masked logits(obs_{t-1})) (the benchmark's
   ``step_mono_policy`` semantics, testing.py:37-44) fed into
   ``step_mono_external_exact``.  If every argmax agrees, the whole
   trajectory (incl. obs bits) is identical CPU-vs-TPU.
2. ``modular_open``: the tuned sort/press agents' argmax decisions on the
   obs streams of exact-engine *rule-based* episodes (obs bits already
   proven platform-identical in artifacts/exact_tpu_traj.npz) — isolates
   pure MLP decision portability on genuine benchmark observations.

Usage:  python exact_tpu_model_actions.py tpu|cpu out.npz
Compare: python exact_tpu_model_actions.py compare a.npz b.npz
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

mode = sys.argv[1]

import numpy as np

if mode == "compare":
    a, b = np.load(sys.argv[2]), np.load(sys.argv[3])
    total = {"mono_closed": 0, "modular_sort": 0, "modular_press": 0}
    agree = dict(total)
    for k in a.files:
        for cat in total:
            if k.startswith(cat):
                total[cat] += a[k].size
                agree[cat] += int((a[k] == b[k]).sum())
    for cat in total:
        print(f"{cat:14s}: {agree[cat]}/{total[cat]} actions agree "
              f"({100.0*agree[cat]/max(total[cat],1):.2f}%)")
    sys.exit(0)

out_path = sys.argv[2]
if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import dynamics as D
from marl_sortingenv_tpu.core import exact_dynamics as XD
from marl_sortingenv_tpu.core import state as S
from marl_sortingenv_tpu.models import mlp
from marl_sortingenv_tpu.utils.checkpoint import load_model

print("backend:", jax.devices()[0].platform, flush=True)
cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)
STEPS, SEEDS = 200, range(1, 11)
HERE = os.path.dirname(os.path.abspath(__file__))

sp = load_model(os.path.join(HERE, "models_tuned/PPO_Sorting_Tuned_100000.npz"),
                mlp.init_params(jax.random.PRNGKey(0), 13, 2))
pp = load_model(os.path.join(HERE, "models_tuned/PPO_Pressing_Tuned_100000.npz"),
                mlp.init_params(jax.random.PRNGKey(0), 16, 11))
mono = load_model(os.path.join(HERE, "models_tuned/PPO_Monolith_Tuned_100000.npz"),
                  mlp.init_params(jax.random.PRNGKey(0), 29, 22))


def mono_closed(seed):
    st = S.reset(cfg, seed)

    def body(carry, _):
        st, obs, mask = carry
        a = jnp.argmax(
            mlp.masked_logits(mlp.policy_logits(mono, obs), mask),
            axis=-1).astype(jnp.int32)
        st, out = XD.step_mono_external_exact(cfg, st, a, True)
        return (st, XD.get_mono_obs_exact(cfg, st),
                D.monolith_action_masks(cfg, st)), a

    init = (st, XD.get_mono_obs_exact(cfg, st),
            D.monolith_action_masks(cfg, st))
    _, actions = jax.jit(
        lambda c: lax.scan(body, c, None, length=STEPS))(init)
    return np.asarray(actions)


def rule_obs_stream(seed):
    st = S.reset(cfg, seed)

    def body(st, _):
        so = XD.get_sort_obs_exact(cfg, st)
        po = XD.get_press_obs_exact(cfg, st)
        pm = D.press_action_masks(cfg, st)
        st2, _ = XD.step_mono_rule_exact(cfg, st)
        return st2, (so, po, pm)

    _, (so, po, pm) = jax.jit(
        lambda s: lax.scan(body, s, None, length=STEPS))(st)
    return so, po, pm


out = {}
for seed in SEEDS:
    out[f"mono_closed_{seed}"] = mono_closed(seed)
    so, po, pm = rule_obs_stream(seed)
    out[f"modular_sort_{seed}"] = np.asarray(
        jnp.argmax(mlp.policy_logits(sp, so), axis=-1))
    out[f"modular_press_{seed}"] = np.asarray(jnp.argmax(
        mlp.masked_logits(mlp.policy_logits(pp, po), pm), axis=-1))
    print(f"seed {seed} done", flush=True)

np.savez(out_path, **out)
print("saved", out_path)
