"""Benchmark scenario-5 protocol parity: model predicts on the previous
obs and steps through the external path (reference testing.py:37-53),
masked and unmasked."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import state as S, step as ST
from marl_sortingenv_tpu.models import mlp

import reference_oracle as oracle

CFG = load_config(max_steps=200, noise_sorting=0.0, balesize=200)


class Stub:
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


def _reference_test_env(seed, steps, params, use_action_masking):
    env = oracle.make_env("mono", max_steps=200, seed=seed)
    stub = Stub(params)
    with oracle.reference_cwd():
        obs, _ = env.reset(seed=seed)
        records = []
        for _ in range(steps):
            if use_action_masking:
                a, _ = stub.predict(obs, action_masks=env.action_masks())
            else:
                a, _ = stub.predict(obs)
            obs, r, done, _, info = env.step(
                action=a, use_action_masking=use_action_masking)
            records.append({"obs": np.asarray(obs, np.float32),
                            "reward": np.float64(r),
                            "action": int(info["action"])})
    return records


def _ours(seed, steps, params, use_action_masking):
    st = S.reset(CFG, seed)

    def body(st, _):
        st, out = ST.step_mono_policy(CFG, st, params, mlp.policy_logits,
                                      use_action_masking)
        return st, out

    _, outs = jax.jit(lambda st: lax.scan(body, st, None, length=steps))(st)
    return outs


def test_mono_benchmark_protocol_masked():
    params = mlp.init_params(jax.random.PRNGKey(7), 29, 22)
    records = _reference_test_env(2, 150, params, True)
    outs = _ours(2, 150, params, True)
    np.testing.assert_array_equal(
        np.asarray(outs.action), np.array([r["action"] for r in records]))
    np.testing.assert_array_equal(
        np.asarray(outs.obs), np.stack([r["obs"] for r in records]))


def test_mono_benchmark_protocol_unmasked():
    params = mlp.init_params(jax.random.PRNGKey(8), 29, 22)
    records = _reference_test_env(3, 150, params, False)
    outs = _ours(3, 150, params, False)
    np.testing.assert_array_equal(
        np.asarray(outs.action), np.array([r["action"] for r in records]))
    np.testing.assert_array_equal(
        np.asarray(outs.obs), np.stack([r["obs"] for r in records]))
