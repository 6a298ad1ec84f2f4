"""Parity for the remaining action-source paths: Env_2 unmasked sanitize,
monolith mode='model' with a non-maskable press agent, Env_2 with agents
on both sides."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import state as S, step as ST
from marl_sortingenv_tpu.models import mlp

import reference_oracle as oracle

CFG = load_config(max_steps=200, noise_sorting=0.0, balesize=200)


class NumpyAgent:
    """SB3-like predict stub (plain PPO — no action_masks kwarg use)."""

    def __init__(self, params):
        self.p = jax.tree.map(lambda a: np.asarray(a), params)

    def predict(self, obs, deterministic=True, action_masks=None):
        x = np.asarray(obs, np.float32)
        for lyr in self.p.pi:
            x = np.tanh(x @ lyr.w + lyr.b)
        logits = x @ self.p.action.w + self.p.action.b
        if action_masks is not None:
            logits = np.where(np.asarray(action_masks, bool), logits,
                              np.finfo(np.float32).min)
        return int(np.argmax(logits)), None


def test_env2_unmasked_sanitize_parity():
    seed, steps = 21, 150
    rng = np.random.default_rng(5)
    actions = rng.integers(0, 11, steps)
    _, records = oracle.run_episode("press", seed, steps, actions=actions,
                                    use_action_masking=False)
    st = S.reset(CFG, seed)

    def body(st, a):
        st, out = ST.step_press(CFG, st, a, None, False)
        return st, out

    st_f, outs = jax.jit(lambda st, acts: lax.scan(body, st, acts))(
        st, jnp.asarray(actions, jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(outs.obs), np.stack([r["obs"] for r in records]))
    np.testing.assert_array_equal(
        np.asarray(outs.reward), np.array([r["reward"] for r in records]))


def test_mono_model_nonmaskable_press_agent_parity():
    """mode='model' with a plain-PPO press agent: the reference detects
    non-Maskable and predicts WITHOUT the mask (env_monolith.py:201-212)."""
    seed, steps = 17, 120
    sort_p = mlp.init_params(jax.random.PRNGKey(10), 13, 2)
    press_p = mlp.init_params(jax.random.PRNGKey(11), 16, 11)

    env = oracle.make_env("mono", max_steps=200, seed=seed)
    with oracle.reference_cwd():
        env.reset(seed=seed)
        env.set_agents(sort_agent=NumpyAgent(sort_p),
                       press_agent=NumpyAgent(press_p))
        records = []
        for _ in range(steps):
            obs, r, done, _, info = env.step(action=None, mode="model",
                                             use_action_masking=True)
            records.append({"obs": np.asarray(obs, np.float32),
                            "reward": np.float64(r),
                            "action": int(info["action"])})

    st = S.reset(CFG, seed)

    def body(st, _):
        st, out = ST.step_mono_model(
            CFG, st, (mlp.policy_logits, sort_p),
            (mlp.policy_logits, press_p), True, False)  # not maskable
        return st, out

    st_f, outs = jax.jit(
        lambda st: lax.scan(body, st, None, length=steps))(st)
    np.testing.assert_array_equal(
        np.asarray(outs.action), np.array([r["action"] for r in records]))
    np.testing.assert_array_equal(
        np.asarray(outs.obs), np.stack([r["obs"] for r in records]))


def test_mono_model_maskable_press_agent_parity():
    """mode='model' with a maskable press agent (reference checks
    'Maskable' in the type name)."""
    seed, steps = 23, 120
    sort_p = mlp.init_params(jax.random.PRNGKey(20), 13, 2)
    press_p = mlp.init_params(jax.random.PRNGKey(21), 16, 11)

    class MaskableStubPPO(NumpyAgent):
        # the reference detects maskability via hasattr(agent, 'policy')
        # AND 'Maskable' in the type name (env_monolith.py:201)
        policy = object()

    env = oracle.make_env("mono", max_steps=200, seed=seed)
    with oracle.reference_cwd():
        env.reset(seed=seed)
        env.set_agents(sort_agent=NumpyAgent(sort_p),
                       press_agent=MaskableStubPPO(press_p))
        records = []
        for _ in range(steps):
            obs, r, done, _, info = env.step(action=None, mode="model",
                                             use_action_masking=True)
            records.append({"obs": np.asarray(obs, np.float32),
                            "action": int(info["action"])})

    st = S.reset(CFG, seed)

    def body(st, _):
        st, out = ST.step_mono_model(
            CFG, st, (mlp.policy_logits, sort_p),
            (mlp.policy_logits, press_p), True, True)  # maskable
        return st, out

    st_f, outs = jax.jit(
        lambda st: lax.scan(body, st, None, length=steps))(st)
    np.testing.assert_array_equal(
        np.asarray(outs.action), np.array([r["action"] for r in records]))
