"""Pallas redistribution kernel: interpret-mode correctness vs the fast
engine's XLA implementation (identical distribution/invariants)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marl_sortingenv_tpu.ops import mvhg_pallas as K


def test_kernel_invariants_interpret():
    rng = np.random.default_rng(0)
    N = 16
    counts = rng.integers(0, 60, (N, 4)).astype(np.int32)
    acc = np.full((N, 4), 0.75, np.float32)
    acc[:, 0] = 1.0
    uniforms = rng.random((N, 12)).astype(np.float32)

    leftover, true_arr, false_arr = K.sort_redistribute(
        jnp.asarray(counts), jnp.asarray(acc), jnp.asarray(uniforms),
        interpret=True)
    leftover = np.asarray(leftover)
    true_arr = np.asarray(true_arr)
    false_arr = np.asarray(false_arr)

    # material accounting: true + removed-by-draws + leftover == input
    assert (leftover >= 0).all()
    assert (true_arr >= 0).all() and (false_arr >= 0).all()
    # station split: true + false == target at processing time; total
    # conservation: true + false + leftover-to-E == input
    total_in = counts.sum(1)
    e_units = leftover.sum(1)
    # redistribution removes exactly false units per station (never breaks
    # early: station i's own false units are part of the pool)
    assert (true_arr.sum(1) + false_arr.sum(1) + e_units == total_in).all()


def test_kernel_zero_input():
    z = jnp.zeros((8, 4), jnp.int32)
    acc = jnp.full((8, 4), 0.75, jnp.float32)
    u = jnp.full((8, 12), 0.5, jnp.float32)
    leftover, t, f = K.sort_redistribute(z, acc, u, interpret=True)
    assert (np.asarray(leftover) == 0).all()
    assert (np.asarray(t) == 0).all()


def test_kernel_statistics_match_fast_engine():
    """Means of removed counts should match the fast engine's MVHG."""
    from marl_sortingenv_tpu.core import fast as FE

    N = 512
    counts = np.tile(np.array([40, 15, 35, 10], np.int32), (N, 1))
    acc = np.full((N, 4), 0.75, np.float32)
    rng = np.random.default_rng(1)
    uniforms = rng.random((N, 12)).astype(np.float32)

    leftover_k, t_k, f_k = K.sort_redistribute(
        jnp.asarray(counts), jnp.asarray(acc), jnp.asarray(uniforms),
        interpret=True)

    # fast-engine equivalent: run _mvhg4 chain manually with same logic
    keys = jax.random.split(jax.random.PRNGKey(2), N)

    def one(key, c):
        leftover = c
        tt = jnp.zeros(4, jnp.int32)
        ff = jnp.zeros(4, jnp.int32)
        for i in range(4):
            target = leftover[i]
            tv = jnp.rint(target.astype(jnp.float32) * 0.75).astype(jnp.int32)
            fv = target - tv
            tt = tt.at[i].set(tv)
            ff = ff.at[i].set(fv)
            leftover = leftover.at[i].set(fv)
            key, sk = jax.random.split(key)
            removed = FE._mvhg4(sk, leftover, fv)
            leftover = leftover - removed
        return leftover

    lf = jax.jit(jax.vmap(one))(keys, jnp.asarray(counts))
    m_k = np.asarray(leftover_k).mean(0)
    m_f = np.asarray(lf).mean(0)
    np.testing.assert_allclose(m_k, m_f, atol=1.5)


def test_kernel_bitwise_equals_fastb_redistribute():
    """Interpret-mode kernel == fastb.redistribute_u exactly, given the
    SAME pre-drawn uniforms (VERDICT r1 next-round #9: the kernel is
    pinned to the production redistribution core so it cannot rot)."""
    from marl_sortingenv_tpu.core import fastb as FB

    rng = np.random.default_rng(3)
    N = 32
    counts = rng.integers(0, 80, (N, 4)).astype(np.int32)
    acc = np.where(rng.random((N, 4)) < 0.5, 1.0, 0.75).astype(np.float32)
    # include noisy accuracies too (fast engines allow arbitrary f32 acc)
    acc[: N // 2] = np.clip(
        acc[: N // 2] + rng.uniform(-0.05, 0.05, (N // 2, 4)), 0, 1
    ).astype(np.float32)
    uniforms = rng.random((N, 12)).astype(np.float32)

    lk, tk, fk = K.sort_redistribute(
        jnp.asarray(counts), jnp.asarray(acc), jnp.asarray(uniforms),
        interpret=True)
    lf, tf, ff = jax.jit(
        lambda c, a, u: FB.redistribute_u(c, a, u, support=K.SUPPORT))(
        jnp.asarray(counts.T), jnp.asarray(acc.T), jnp.asarray(uniforms.T))

    np.testing.assert_array_equal(np.asarray(lk), np.asarray(lf).T)
    np.testing.assert_array_equal(np.asarray(tk), np.asarray(tf).T)
    np.testing.assert_array_equal(np.asarray(fk), np.asarray(ff).T)
