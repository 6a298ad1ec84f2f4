"""Seed-fuzz golden parity: many random seeds, shorter episodes, mixed
modes — broad evidence that parity is seed-independent."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import state as S, step as ST

import reference_oracle as oracle

CFG = load_config(max_steps=200, noise_sorting=0.0, balesize=200)


def test_rule_based_parity_many_seeds():
    rng = np.random.default_rng(99)
    seeds = rng.integers(0, 2**31, 8)
    steps = 60

    def body(st, _):
        st, out = ST.step_mono_rule(CFG, st)
        return st, out

    run = jax.jit(lambda st: lax.scan(body, st, None, length=steps))
    for seed in seeds:
        _, records = oracle.run_episode("mono", int(seed), steps,
                                        mode="rule_based")
        st_f, outs = run(S.reset(CFG, int(seed)))
        np.testing.assert_array_equal(
            np.asarray(outs.obs), np.stack([r["obs"] for r in records]),
            err_msg=f"seed {seed}")
        snap = records[-1]["snap"]
        np.testing.assert_array_equal(
            np.asarray(st_f.cont_true), snap["cont_true"])
        np.testing.assert_array_equal(
            np.asarray(st_f.press_timer), snap["press_timer"])


def test_sort_env_parity_many_seeds():
    rng = np.random.default_rng(7)
    seeds = rng.integers(0, 2**31, 6)
    steps = 60
    run = jax.jit(lambda st, acts: lax.scan(
        lambda s, a: ST.step_sort(CFG, s, a), st, acts))
    for seed in seeds:
        actions = np.random.default_rng(int(seed)).integers(0, 2, steps)
        _, records = oracle.run_episode("sort", int(seed), steps,
                                        actions=actions)
        st_f, outs = run(S.reset(CFG, int(seed)),
                         jnp.asarray(actions, jnp.int32))
        np.testing.assert_array_equal(
            np.asarray(outs.obs), np.stack([r["obs"] for r in records]),
            err_msg=f"seed {seed}")
