"""Hierarchical control (BASELINE config 3): Env_2_Pressing with a frozen
sorting policy.  The reference calls ``sort_agent.predict(obs,
deterministic=True)`` inside its step (env_2_press.py:106-109); our build
fuses the MLP forward into the jitted step.  Both sides run the *same*
weights — the reference via a NumPy stub with SB3 ``predict`` semantics
(argmax of logits), ours on device."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import state as S, step as ST
from marl_sortingenv_tpu.models import mlp

import reference_oracle as oracle

CFG = load_config(max_steps=200, noise_sorting=0.0, balesize=200)


class NumpyStubAgent:
    """SB3-like ``predict`` on numpy arrays, same math as models.mlp."""

    def __init__(self, params):
        self.params = jax.tree.map(lambda a: np.asarray(a), params)

    def predict(self, obs, deterministic=True):
        x = np.asarray(obs, np.float32)
        for lyr in self.params.pi:
            x = np.tanh(x @ lyr.w + lyr.b)
        logits = x @ self.params.action.w + self.params.action.b
        return int(np.argmax(logits)), None


def test_env2_with_frozen_sort_agent_parity():
    seed, steps = 9, 150
    params = mlp.init_params(jax.random.PRNGKey(0), obs_dim=13, n_actions=2)
    stub = NumpyStubAgent(params)

    env = oracle.make_env("press", max_steps=200, seed=seed)
    with oracle.reference_cwd():
        env.reset(seed=seed)
        env.set_agents(sort_agent=stub)
    rng = np.random.default_rng(31)
    actions, records = [], []
    with oracle.reference_cwd():
        for t in range(steps):
            mask = env.press_action_masks()
            a = int(rng.choice(np.flatnonzero(mask)))
            actions.append(a)
            obs, r, done, _, info = env.step(a, use_action_masking=True)
            records.append({
                "obs": np.asarray(obs, np.float32),
                "reward": np.float64(r),
                "sort_mode": int(env.sensor_current_setting),
                "snap": oracle.snapshot(env),
            })

    st = S.reset(CFG, seed)

    def body(st, a):
        st, out = ST.step_press(CFG, st, a,
                                sort_policy=(mlp.policy_logits, params),
                                use_action_masking=True)
        return st, out

    st_f, outs = jax.jit(lambda st, acts: lax.scan(body, st, acts))(
        st, jnp.asarray(actions, jnp.int32))

    ref_obs = np.stack([r["obs"] for r in records])
    np.testing.assert_array_equal(np.asarray(outs.obs), ref_obs)
    ref_rew = np.array([r["reward"] for r in records])
    np.testing.assert_array_equal(np.asarray(outs.reward), ref_rew)
    snap = records[-1]["snap"]
    np.testing.assert_array_equal(np.asarray(st_f.cont_true), snap["cont_true"])
    # the embedded policy actually switched modes during the episode
    modes = [r["sort_mode"] for r in records]
    assert len(set(modes)) >= 1


def test_mono_modular_model_mode_parity():
    """Monolith mode='model' with sort fallback random + press fallback
    random-masked (env_monolith.py:186-221) — exercises rng_sorting and
    rng_pressing streams."""
    seed, steps = 4, 150
    _, records = oracle.run_episode("mono", seed, steps, mode="model",
                                    use_action_masking=True)
    st = S.reset(CFG, seed)

    def body(st, _):
        st, out = ST.step_mono_model(CFG, st, None, None, True, True)
        return st, out

    st_f, outs = jax.jit(
        lambda st: lax.scan(body, st, None, length=steps))(st)
    ref_obs = np.stack([r["obs"] for r in records])
    np.testing.assert_array_equal(np.asarray(outs.obs), ref_obs)
    ref_rew = np.array([r["reward"] for r in records])
    np.testing.assert_allclose(np.asarray(outs.reward), ref_rew,
                               rtol=0, atol=0)
    ref_act = np.array([r["action"] for r in records])
    np.testing.assert_array_equal(np.asarray(outs.action), ref_act)


def test_mono_with_mono_agent_parity():
    """Monolith path 2: internally stored monolith agent (masked
    deterministic predict on the 29-dim obs)."""
    seed, steps = 13, 120
    params = mlp.init_params(jax.random.PRNGKey(3), obs_dim=29, n_actions=22)

    class MaskStub:
        def __init__(self, params):
            self.p = jax.tree.map(lambda a: np.asarray(a), params)

        def predict(self, obs, deterministic=True, action_masks=None):
            x = np.asarray(obs, np.float32)
            for lyr in self.p.pi:
                x = np.tanh(x @ lyr.w + lyr.b)
            logits = x @ self.p.action.w + self.p.action.b
            if action_masks is not None:
                logits = np.where(np.asarray(action_masks, bool), logits,
                                  np.float32(np.finfo(np.float32).min))
            return int(np.argmax(logits)), None

    env = oracle.make_env("mono", max_steps=200, seed=seed)
    with oracle.reference_cwd():
        env.reset(seed=seed)
        env.set_agents(mono_agent=MaskStub(params))
        records = []
        for t in range(steps):
            obs, r, done, _, info = env.step(action=None, mode=None,
                                             use_action_masking=True)
            records.append({
                "obs": np.asarray(obs, np.float32),
                "reward": np.float64(r),
                "action": np.int64(info["action"]),
            })

    st = S.reset(CFG, seed)

    def body(st, _):
        st, out = ST.step_mono_agent(CFG, st, params, mlp.policy_logits, True)
        return st, out

    st_f, outs = jax.jit(
        lambda st: lax.scan(body, st, None, length=steps))(st)
    np.testing.assert_array_equal(
        np.asarray(outs.action), np.array([r["action"] for r in records]))
    np.testing.assert_array_equal(
        np.asarray(outs.obs), np.stack([r["obs"] for r in records]))
