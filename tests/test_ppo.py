"""Learner sanity: shapes, mask-respect, GAE correctness vs a reference
NumPy implementation, and a short learning-progress smoke test."""

import numpy as np
import jax
import jax.numpy as jnp

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo
from marl_sortingenv_tpu.models import mlp

CFG = load_config(max_steps=50, noise_sorting=0.0, balesize=200)


def test_gae_matches_numpy_reference():
    pcfg = ppo.PPOConfig(n_steps=8)
    T, N = 8, 3
    rng = np.random.default_rng(0)
    rewards = rng.normal(size=(T, N)).astype(np.float32)
    values = rng.normal(size=(T, N)).astype(np.float32)
    dones = rng.random((T, N)) < 0.2
    last_value = rng.normal(size=N).astype(np.float32)

    trs = ppo.Transition(
        obs=jnp.zeros((T, N, 1)), mask=jnp.ones((T, N, 2), bool),
        action=jnp.zeros((T, N), jnp.int32), logp=jnp.zeros((T, N)),
        value=jnp.asarray(values), reward=jnp.asarray(rewards),
        done=jnp.asarray(dones),
    )
    adv, ret = jax.jit(lambda t, lv: ppo.compute_gae(pcfg, t, lv))(
        trs, jnp.asarray(last_value))

    # straightforward reverse-loop reference
    expected = np.zeros((T, N), np.float32)
    gae = np.zeros(N, np.float32)
    next_v = last_value.copy()
    for t in reversed(range(T)):
        nonterm = 1.0 - dones[t]
        delta = rewards[t] + pcfg.gamma * next_v * nonterm - values[t]
        gae = delta + pcfg.gamma * pcfg.gae_lambda * nonterm * gae
        expected[t] = gae
        next_v = values[t]
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), expected + values, rtol=1e-5)


def test_rollout_shapes_and_masks_respected():
    pcfg = ppo.PPOConfig(n_steps=12, batch_size=16, n_epochs=1)
    spec = ppo.spec_for("mono")
    ts = ppo.init_train_state(CFG, pcfg, spec, n_envs=4)
    step_fn = spec.step_fn(None, True)
    ts, trs, last_value = jax.jit(
        lambda ts: ppo.collect_rollout(CFG, pcfg, spec, ts, step_fn))(ts)
    # batch-last transitions: obs [T, D, N], mask [T, A, N]
    assert trs.obs.shape == (12, 29, 4)
    assert trs.mask.shape == (12, 22, 4)
    assert trs.action.shape == (12, 4)
    # sampled actions always valid under the mask
    chosen_valid = np.take_along_axis(
        np.asarray(trs.mask), np.asarray(trs.action)[:, None, :], axis=1)
    assert chosen_valid.all()


def test_train_iteration_runs_and_improves_entropy_control():
    pcfg = ppo.PPOConfig(n_steps=64, batch_size=64, n_epochs=2)
    spec = ppo.spec_for("sort")
    ts = ppo.init_train_state(CFG, pcfg, spec, n_envs=8)
    it = ppo.make_train_iteration(CFG, pcfg, spec)
    ts, stats = it(ts)
    assert np.isfinite(float(stats["loss"]))
    ts2, stats2 = it(ts)
    # params actually changed
    delta = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, ts.params, ts2.params), 0.0)
    assert delta > 0


def test_sort_agent_learning_regression_floor():
    """Learning-curve regression with teeth (VERDICT round-1 weak #3):
    fixed seed, ~80k env-steps (the reference protocol budget scale) on
    the fastb engine, assert a *floor* on the deterministic sort eval
    return over full 200-step episodes.

    Calibration (CPU, deterministic at seed 42): untrained argmax policy
    scores ~51.8; the trained agent reaches ~76.4 after 20 iterations; a
    deliberately broken learner (sign-flipped advantages, same budget)
    collapses to ~38.3.  Floor 65 separates all three with wide margin —
    a learner regression (GAE sign, masked entropy, minibatch perm,
    optimizer wiring) fails this test."""
    cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)
    pcfg = ppo.PPOConfig.tuned(n_steps=128, batch_size=256, n_epochs=4)
    spec = ppo.spec_for("sort", engine="fastb")
    ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=32, seed=42)
    it = ppo.make_train_iteration(cfg, pcfg, spec)
    r0 = float(np.mean(np.asarray(
        ppo.evaluate(cfg, spec, ts.params, n_envs=16, n_steps=200))))
    for _ in range(20):
        ts, stats = it(ts)
    assert np.isfinite(float(stats["loss"]))
    r1 = float(np.mean(np.asarray(
        ppo.evaluate(cfg, spec, ts.params, n_envs=16, n_steps=200))))
    assert r1 >= 65.0, (r0, r1)
    assert r1 > r0 + 5.0, (r0, r1)


def _floor_setup(name, sort_policy=None):
    cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)
    pcfg = ppo.PPOConfig.tuned(n_steps=128, batch_size=256, n_epochs=4)
    spec = ppo.spec_for(name, engine="fastb")
    ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=32, seed=42)

    def ev(params):
        return float(np.mean(np.asarray(ppo.evaluate(
            cfg, spec, params, n_envs=16, n_steps=200,
            sort_policy=sort_policy))))

    it = ppo.make_train_iteration(cfg, pcfg, spec, sort_policy=sort_policy)
    return ts, it, ev


def test_press_agent_learning_regression_floor():
    """Press learner floor with a FROZEN sort policy in the loop (VERDICT
    round-2 item 5): the hierarchical path (env_2_press.py:106-109) has
    the most moving parts — frozen-MLP fused in the rollout, press mask
    plumbing, 11-action codec.

    Calibration (fastb, seed 42, 15 iters ~= 60k steps, frozen tuned sort
    agent): untrained -173.4 -> trained -63.9; sign-flipped-advantage
    learner -> -179.7.  Floor -100 separates all three by >35."""
    from marl_sortingenv_tpu.utils.checkpoint import load_model
    import os

    sp = load_model(
        os.path.join(os.path.dirname(__file__), "..", "artifacts",
                     "models_tuned", "PPO_Sorting_Tuned_100000.npz"),
        mlp.init_params(jax.random.PRNGKey(0), 13, 2))
    ts, it, ev = _floor_setup("press", sort_policy=(mlp.policy_logits, sp))
    r0 = ev(ts.params)
    for _ in range(15):
        ts, stats = it(ts)
    assert np.isfinite(float(stats["loss"]))
    r1 = ev(ts.params)
    assert r1 >= -100.0, (r0, r1)
    assert r1 > r0 + 20.0, (r0, r1)


def test_mono_agent_learning_regression_floor():
    """Monolith learner floor: the 22-action codec + monolith masks.

    Calibration (fastb, seed 42, 15 iters): untrained -109.5 ->
    trained -31.0; sign-flipped-advantage learner -> -136.1.  Floor -70
    separates all three by ~40."""
    ts, it, ev = _floor_setup("mono")
    r0 = ev(ts.params)
    for _ in range(15):
        ts, stats = it(ts)
    assert np.isfinite(float(stats["loss"]))
    r1 = ev(ts.params)
    assert r1 >= -70.0, (r0, r1)
    assert r1 > r0 + 20.0, (r0, r1)


def test_train_run_matches_per_iteration():
    """make_train_run (scanned segment) must be semantically identical to
    repeated make_train_iteration dispatches."""
    pcfg = ppo.PPOConfig(n_steps=8, batch_size=16, n_epochs=2)
    spec = ppo.spec_for("mono", engine="fastb")
    ts_a = ppo.init_train_state(CFG, pcfg, spec, n_envs=4, seed=7)
    ts_b = ppo.init_train_state(CFG, pcfg, spec, n_envs=4, seed=7)

    it = ppo.make_train_iteration(CFG, pcfg, spec)
    losses = []
    for _ in range(3):
        ts_a, stats = it(ts_a)
        losses.append(float(stats["loss"]))

    run = ppo.make_train_run(CFG, pcfg, spec, 3)
    ts_b, seg_stats = run(ts_b)
    np.testing.assert_allclose(np.asarray(seg_stats["loss"]),
                               np.asarray(losses), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ts_a.params.action.w), np.asarray(ts_b.params.action.w),
        rtol=1e-5, atol=1e-7)
    assert seg_stats["mean_episode_return"].shape == (3,)

    # seg_unroll is pure scheduling (artifacts/train_run_gap_r5.md): the
    # fully-unrolled segment must be BITWISE identical to the rolled one
    ts_c = ppo.init_train_state(CFG, pcfg, spec, n_envs=4, seed=7)
    ts_c, seg_stats_u = ppo.make_train_run(
        CFG, pcfg, spec, 3, seg_unroll=3)(ts_c)
    np.testing.assert_array_equal(np.asarray(seg_stats_u["loss"]),
                                  np.asarray(seg_stats["loss"]))
    np.testing.assert_array_equal(np.asarray(ts_c.params.action.w),
                                  np.asarray(ts_b.params.action.w))


def test_mask_bitpack_roundtrip_exact():
    """Round 4 packs the A mask rows of the update's sample buffer into
    one f32 bit-field row (~40% less update HBM traffic at A=22); the
    pack/unpack round trip must be EXACT for every mask pattern."""
    import numpy as np

    A, B = 22, 64
    rng = np.random.default_rng(0)
    mask = rng.integers(0, 2, size=(A, B)).astype(bool)
    mask[:, 0] = True
    mask[:, 1] = False
    pow2 = jnp.asarray([float(1 << j) for j in range(A)], jnp.float32)
    bits = jnp.tensordot(pow2, jnp.asarray(mask, jnp.float32), axes=(0, 0))
    bits_i = bits.astype(jnp.int32)
    rec = ((bits_i[None, :] >> jax.lax.broadcasted_iota(
        jnp.int32, (A, B), 0)) & 1) > 0
    np.testing.assert_array_equal(np.asarray(rec), mask)
