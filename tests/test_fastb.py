"""Batch-last fast engine (core.fastb) == vmapped per-env fast engine
(core.fast), BIT-FOR-BIT.

Both engines make identical `jax.random` calls per instance (fastb maps
the per-env call over the key batch), so for the same seed every state
leaf, observation, mask, and reward must match exactly — including f32
bits — on CPU.  This pins the layout rewrite to the already
parity-validated engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fast as FE
from marl_sortingenv_tpu.core import fastb as FB

N_ENVS = 64
N_STEPS = 150  # > press cycles, pattern switches, and bale merges


def _assert_state_equal(st_f, st_b, ctx=""):
    st_b_bf = FB.to_batch_first(st_b)
    for name, a, b in zip(FE.FastEnvState._fields, st_f, st_b_bf):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype, (name, ctx)
        assert a.shape == b.shape, (name, ctx, a.shape, b.shape)
        if not np.array_equal(a, b):
            idx = np.argwhere(a != b)[:4]
            raise AssertionError(
                f"{ctx} leaf {name} differs at {idx.tolist()}: "
                f"{a[tuple(idx[0])]} vs {b[tuple(idx[0])]}")


def _assert_out_equal(out_f, out_b, ctx=""):
    for name, a, b in zip(out_f._fields, out_f, out_b):
        assert np.array_equal(np.asarray(a), np.asarray(b)), (ctx, name)


def _run_pair(cfg, step_f, step_b, actions=None, autoreset=False,
              steps=N_STEPS, seed=0):
    """Scan both engines from the same seed; compare final state and all
    per-step outputs bitwise."""
    st_f = FE.reset_batch(cfg, jax.random.PRNGKey(seed), N_ENVS)
    st_b = FB.reset_batch(cfg, jax.random.PRNGKey(seed), N_ENVS)
    _assert_state_equal(st_f, st_b, "reset")

    if autoreset:
        f_step = jax.vmap(FE.with_autoreset(cfg, step_f))
        b_step = FB.with_autoreset(cfg, step_b)
    else:
        f_step = jax.vmap(lambda s, a: step_f(cfg, s, a))
        b_step = lambda s, a: step_b(cfg, s, a)

    if actions is None:
        actions = jnp.zeros((steps, N_ENVS), jnp.int32)

    @jax.jit
    def run_f(st):
        return jax.lax.scan(f_step, st, actions)

    @jax.jit
    def run_b(st):
        return jax.lax.scan(b_step, st, actions)

    st_f, outs_f = run_f(st_f)
    st_b, outs_b = run_b(st_b)
    _assert_state_equal(st_f, st_b, "final")
    _assert_out_equal(outs_f, outs_b, "outs")


@pytest.fixture(scope="module")
def cfg():
    # this suite proves fastb's FULL bale layout bit-equals the per-env
    # fast engine, so pin bale_mode (the default "auto" -> events)
    return load_config(bale_mode="full")


def test_reset_bitwise(cfg):
    st_f = FE.reset_batch(cfg, jax.random.PRNGKey(7), N_ENVS)
    st_b = FB.reset_batch(cfg, jax.random.PRNGKey(7), N_ENVS)
    _assert_state_equal(st_f, st_b)
    # round-trip conversion
    _assert_state_equal(st_f, FB.from_batch_first(st_f))


def test_mono_rule_bitwise(cfg):
    _run_pair(cfg, lambda c, s, a: FE.step_mono_rule(c, s),
              lambda c, s, a: FB.step_mono_rule(c, s))


def test_mono_rule_autoreset_bitwise(cfg):
    short = load_config(max_steps=37, bale_mode="full")
    _run_pair(short, lambda c, s, a: FE.step_mono_rule(c, s),
              lambda c, s, a: FB.step_mono_rule(c, s),
              autoreset=True, steps=120)


def test_mono_external_bitwise(cfg):
    rng = np.random.default_rng(3)
    acts = jnp.asarray(rng.integers(0, 22, (N_STEPS, N_ENVS)), jnp.int32)
    _run_pair(cfg, FE.step_mono_external, FB.step_mono_external,
              actions=acts)


def test_mono_external_unmasked_bitwise(cfg):
    rng = np.random.default_rng(4)
    acts = jnp.asarray(rng.integers(0, 22, (N_STEPS, N_ENVS)), jnp.int32)
    _run_pair(cfg,
              lambda c, s, a: FE.step_mono_external(
                  c, s, a, use_action_masking=False),
              lambda c, s, a: FB.step_mono_external(
                  c, s, a, use_action_masking=False),
              actions=acts)


def test_sort_bitwise(cfg):
    rng = np.random.default_rng(5)
    acts = jnp.asarray(rng.integers(0, 2, (N_STEPS, N_ENVS)), jnp.int32)
    _run_pair(cfg, FE.step_sort, FB.step_sort, actions=acts)


def test_press_bitwise(cfg):
    rng = np.random.default_rng(6)
    acts = jnp.asarray(rng.integers(0, 11, (N_STEPS, N_ENVS)), jnp.int32)
    _run_pair(cfg,
              lambda c, s, a: FE.step_press(c, s, a),
              lambda c, s, a: FB.step_press(c, s, a),
              actions=acts)


def test_press_unmasked_bitwise(cfg):
    rng = np.random.default_rng(8)
    acts = jnp.asarray(rng.integers(0, 11, (N_STEPS, N_ENVS)), jnp.int32)
    _run_pair(cfg,
              lambda c, s, a: FE.step_press(c, s, a,
                                            use_action_masking=False),
              lambda c, s, a: FB.step_press(c, s, a,
                                            use_action_masking=False),
              actions=acts)


def test_noise_config_bitwise():
    noisy = load_config(noise_sorting=0.05, balesize=150,
                        bale_mode="full")
    _run_pair(noisy, lambda c, s, a: FE.step_mono_rule(c, s),
              lambda c, s, a: FB.step_mono_rule(c, s), steps=100)


def test_masks_and_obs_bitwise(cfg):
    st_f = FE.reset_batch(cfg, jax.random.PRNGKey(11), N_ENVS)
    # advance a bit so containers/presses are non-trivial
    step = jax.jit(jax.vmap(lambda s: FE.step_mono_rule(cfg, s)))
    for _ in range(30):
        st_f, _ = step(st_f)
    st_b = FB.from_batch_first(st_f)
    np.testing.assert_array_equal(
        jax.vmap(lambda s: FE.press_action_masks(cfg, s))(st_f),
        FB.press_action_masks(cfg, st_b))
    np.testing.assert_array_equal(
        jax.vmap(lambda s: FE.monolith_action_masks(cfg, s))(st_f),
        FB.monolith_action_masks(cfg, st_b))
    np.testing.assert_array_equal(
        jax.vmap(lambda s: FE.get_mono_obs(cfg, s))(st_f),
        FB.get_mono_obs(cfg, st_b))


def test_press_with_frozen_sort_policy(cfg):
    """Hierarchical path: frozen MLP sort policy inside the press step.
    The batched matmul may reassociate the f32 dot, so the policy path is
    compared with a tight tolerance on floats and exactly on ints."""
    from marl_sortingenv_tpu.models import mlp

    params = mlp.init_params(jax.random.PRNGKey(0), obs_dim=13, n_actions=2)
    pol = (lambda p, o: mlp.policy_logits(p, o), params)

    rng = np.random.default_rng(9)
    acts = jnp.asarray(rng.integers(0, 11, (80, N_ENVS)), jnp.int32)
    st_f = FE.reset_batch(cfg, jax.random.PRNGKey(2), N_ENVS)
    st_b = FB.reset_batch(cfg, jax.random.PRNGKey(2), N_ENVS)

    f_step = jax.jit(jax.vmap(
        lambda s, a: FE.step_press(cfg, s, a, sort_policy=pol)))
    b_step = jax.jit(lambda s, a: FB.step_press(cfg, s, a, sort_policy=pol))
    for t in range(80):
        st_f, out_f = f_step(st_f, acts[t])
        st_b, out_b = b_step(st_b, acts[t])
        # argmax over 2 logits is robust to reassociation unless ties
        np.testing.assert_array_equal(np.asarray(out_f.action),
                                      np.asarray(out_b.action), err_msg=str(t))
    _assert_state_equal(st_f, st_b, "policy-final")


def test_train_iteration_fastb_matches_fast(cfg):
    """One PPO train iteration, engine='fast' vs 'fastb': identical env
    bits + identical policy stream => statistically identical update.
    Compared with a tight tolerance (fusion differences between the two
    graphs can reassociate MLP float ops)."""
    from marl_sortingenv_tpu.learn import ppo

    pcfg = ppo.PPOConfig(n_steps=16, batch_size=32, n_epochs=2)
    losses = {}
    rets = {}
    for engine in ("fast", "fastb"):
        spec = ppo.spec_for("mono", engine=engine)
        ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=8)
        it = ppo.make_train_iteration(cfg, pcfg, spec)
        ts, stats = it(ts)
        ts, stats = it(ts)
        losses[engine] = float(stats["loss"])
        rets[engine] = np.asarray(ts.ep_return_acc)
    assert np.isfinite(losses["fastb"])
    np.testing.assert_allclose(losses["fastb"], losses["fast"], rtol=1e-4)
    np.testing.assert_allclose(rets["fastb"], rets["fast"], rtol=1e-5)
