"""Fast-mode engine: exactness of the hypergeometric sampler, invariant
preservation, and statistical equivalence with the parity engine."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from scipy import stats as sps

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fast as F
from marl_sortingenv_tpu.core import state as S, step as ST

CFG = load_config(max_steps=200, noise_sorting=0.0, balesize=200)


def test_hypergeom_sampler_distribution():
    N, K, n = 80, 30, 25
    m = 20000
    keys = jax.random.split(jax.random.PRNGKey(0), m)
    draws = jax.jit(jax.vmap(
        lambda k: F._hypergeom(k, jnp.int32(N), jnp.int32(K), jnp.int32(n))
    ))(keys)
    draws = np.asarray(draws)
    lo, hi = max(0, n - (N - K)), min(K, n)
    assert draws.min() >= lo and draws.max() <= hi
    expected = sps.hypergeom(N, K, n)
    counts = np.bincount(draws, minlength=hi + 1)
    pk = expected.pmf(np.arange(hi + 1))
    support = pk > 1e-5
    chi2 = (((counts[support] - m * pk[support]) ** 2)
            / (m * pk[support])).sum()
    dof = support.sum() - 1
    # generous: fail only on gross mismatch
    assert chi2 < dof * 3 + 30, (chi2, dof)


def test_hypergeom_edge_cases():
    f = jax.jit(lambda k, N, K, n: F._hypergeom(k, N, K, n))
    key = jax.random.PRNGKey(1)
    assert int(f(key, jnp.int32(0), jnp.int32(0), jnp.int32(0))) == 0
    assert int(f(key, jnp.int32(10), jnp.int32(0), jnp.int32(5))) == 0
    assert int(f(key, jnp.int32(10), jnp.int32(10), jnp.int32(5))) == 5
    assert int(f(key, jnp.int32(7), jnp.int32(3), jnp.int32(7))) == 3


def test_mvhg_conserves():
    keys = jax.random.split(jax.random.PRNGKey(2), 500)
    counts = jnp.array([13, 0, 55, 7], jnp.int32)

    def draw(k):
        return F._mvhg4(k, counts, jnp.int32(40))

    removed = np.asarray(jax.jit(jax.vmap(draw))(keys))
    assert (removed.sum(1) == 40).all()
    assert (removed >= 0).all()
    assert (removed <= np.asarray(counts)).all()
    assert (removed[:, 1] == 0).all()


def test_fast_rollout_invariants():
    n = 64
    st = F.reset_batch(CFG, jax.random.PRNGKey(3), n)

    def body(st, _):
        st, out = jax.vmap(F.with_autoreset(CFG, F.step_sort))(
            st, jnp.zeros(n, jnp.int32))
        return st, (out.reward, out.obs)

    st_f, (rew, obs) = jax.jit(
        lambda st: lax.scan(body, st, None, length=150))(st)
    # conservation (excluding stale sorting stage)
    in_sys = (
        np.asarray(st_f.cont_true).sum(-1)
        + np.asarray(st_f.cont_false).sum(-1)
        + np.asarray(st_f.press_n).sum(-1)
        + np.asarray(st_f.bale_size).sum((-1, -2))
        + np.asarray(st_f.input_counts).sum(-1)
        + np.asarray(st_f.belt_counts).sum(-1)
    )
    np.testing.assert_array_equal(in_sys, np.asarray(st_f.total_input_units))
    assert np.isfinite(np.asarray(rew)).all()
    assert np.isfinite(np.asarray(obs)).all()


def test_fast_vs_parity_statistical_match():
    """Rule-based monolith: mean cumulative rewards and container levels of
    the fast engine must match the parity engine within sampling error."""
    steps, n_fast = 120, 256

    # parity engine over several seeds
    seeds = np.arange(24)
    stp = S.reset(CFG, seeds)

    def pbody(st, _):
        st, out = jax.vmap(lambda s: ST.step_mono_rule(CFG, s))(st)
        return st, out.reward

    stp_f, prew = jax.jit(
        lambda st: lax.scan(pbody, st, None, length=steps))(stp)
    parity_cum = np.asarray(prew).sum(0)

    stf = F.reset_batch(CFG, jax.random.PRNGKey(9), n_fast)

    def fbody(st, _):
        st, out = jax.vmap(lambda s: F.step_mono_rule(CFG, s))(st)
        return st, out.reward

    stf_f, frew = jax.jit(
        lambda st: lax.scan(fbody, st, None, length=steps))(stf)
    fast_cum = np.asarray(frew).sum(0)

    pm, fs = parity_cum.mean(), fast_cum.mean()
    # rule-based runs are tight (std ~1); allow a few std of slack
    assert abs(pm - fs) < 4.0, (pm, fs)

    lvl_p = (np.asarray(stp_f.cont_true).sum(-1)
             + np.asarray(stp_f.cont_false).sum(-1)).mean()
    lvl_f = (np.asarray(stf_f.cont_true).sum(-1)
             + np.asarray(stf_f.cont_false).sum(-1)).mean()
    assert abs(lvl_p - lvl_f) / max(lvl_p, 1) < 0.15, (lvl_p, lvl_f)


def test_fast_unmasked_sanitize_invariants():
    """Unmasked fast engine: invalid external actions never press an
    under-filled container or a busy press."""
    import jax.numpy as jnp
    from jax import lax

    n = 32
    st = F.reset_batch(CFG, jax.random.PRNGKey(11), n)
    key = jax.random.PRNGKey(12)

    def body(carry, _):
        st, key = carry
        key, k1 = jax.random.split(key)
        actions = jax.random.randint(k1, (n,), 0, 22)
        st, out = jax.vmap(
            lambda s, a: F.step_mono_external(CFG, s, a, False))(st, actions)
        return (st, key), out.reward

    (st_f, _), rew = jax.jit(
        lambda c: lax.scan(body, c, None, length=100))((st, key))
    # conservation still holds through the sanitize/skip path
    in_sys = (
        np.asarray(st_f.cont_true).sum(-1)
        + np.asarray(st_f.cont_false).sum(-1)
        + np.asarray(st_f.press_n).sum(-1)
        + np.asarray(st_f.bale_size).sum((-1, -2))
        + np.asarray(st_f.input_counts).sum(-1)
        + np.asarray(st_f.belt_counts).sum(-1)
    )
    np.testing.assert_array_equal(in_sys, np.asarray(st_f.total_input_units))
    # any loaded press must have been loaded with >= balesize units
    n_arr = np.asarray(st_f.press_n)
    assert ((n_arr == 0) | (n_arr >= CFG.effective_balesize)).all()
