"""core.wrappers: rollout helpers, closed-loop policy rollout, batched
overflow wrapper."""

import numpy as np
import jax
import jax.numpy as jnp

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import dynamics as D
from marl_sortingenv_tpu.core import state as S, step as ST, wrappers as W

CFG = load_config(max_steps=30, noise_sorting=0.0)


def test_rollout_actions_array():
    seeds = np.array([1, 2, 3, 4])
    st = S.reset(CFG, seeds)
    actions = np.zeros((20, 4), np.int32)
    st_f, outs = jax.jit(
        lambda st, a: W.rollout(CFG, ST.step_sort, st, a))(st, jnp.asarray(actions))
    assert outs.obs.shape == (20, 4, 13)
    assert (np.asarray(st_f.current_step) == 20).all()


def test_rollout_policy_closed_loop():
    seeds = np.array([5, 6])
    st = S.reset(CFG, seeds)
    obs0 = jax.vmap(lambda s: D.get_sort_obs(CFG, s))(st)

    def policy_fn(obs, masks, key):
        key, sk = jax.random.split(key)
        # random sort mode per env
        actions = jax.random.randint(sk, (obs.shape[0],), 0, 2)
        return actions.astype(jnp.int32), None, key

    (st_f, obs, key), (outs, actions, aux) = jax.jit(
        lambda st, obs0, k: W.rollout_policy(
            CFG, ST.step_sort, st, policy_fn, obs0, k, 15))(
        st, obs0, jax.random.PRNGKey(0))
    assert actions.shape == (15, 2)
    assert np.isfinite(np.asarray(outs.reward)).all()


def test_batched_overflow_wrapper():
    cfg = CFG.with_(container_capacity=60, max_steps=100)
    seeds = np.array([1, 2, 3, 4])
    st = S.reset(cfg, seeds)
    stepped = W.with_overflow_termination(
        cfg, lambda c, s, a: ST.step_mono_external(c, s, a, True), "mono")
    f = jax.jit(jax.vmap(stepped))
    terminated_at = np.full(4, -1)
    for t in range(40):
        st, out = f(st, jnp.zeros(4, jnp.int32))
        done = np.asarray(out.terminated)
        for k in range(4):
            if done[k] and terminated_at[k] < 0:
                terminated_at[k] = t
                assert float(np.asarray(out.reward)[k]) == \
                    cfg.overflow_termination_penalty
        if (terminated_at >= 0).all():
            break
    assert (terminated_at >= 0).all()
