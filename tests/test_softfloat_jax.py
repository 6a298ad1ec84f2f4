"""JAX soft-float kernel vs the validated Python prototype (== IEEE f64)."""

import numpy as np
import jax
import jax.numpy as jnp

from marl_sortingenv_tpu.core import exact32_proto as P
from marl_sortingenv_tpu.core import softfloat as SF


def as_np(sfj):
    return np.asarray(sfj.m, np.uint64), np.asarray(sfj.e, np.int64)


def batch_sf(pairs):
    ms = jnp.asarray([p.m for p in pairs], jnp.uint64)
    es = jnp.asarray([p.e for p in pairs], jnp.int32)
    return SF.SFJ(ms, es)


def test_div_int_domain():
    cases = [(a, b) for b in range(1, 701, 7) for a in range(0, b + 1, 3)]
    cases += [(k, 100) for k in range(0, 401)]
    a = jnp.asarray([c[0] for c in cases], jnp.uint64)
    b = jnp.asarray([c[1] for c in cases], jnp.uint64)
    out = jax.jit(jax.vmap(SF.sf_div_int))(a, b)
    m, e = as_np(out)
    for i, (aa, bb) in enumerate(cases):
        ref = P.sf_div_int(aa, bb)
        assert (m[i], e[i] if m[i] else 0) == (ref.m, ref.e if ref.m else 0), (
            aa, bb, m[i], e[i], ref)


def _random_vals(n, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        b = int(rng.integers(1, 701))
        a = int(rng.integers(0, b + 1))
        out.append(P.sf_div_int(a, b))
    return out


def test_add():
    xs = _random_vals(4000, 0)
    ys = _random_vals(4000, 1)
    out = jax.jit(jax.vmap(SF.sf_add))(batch_sf(xs), batch_sf(ys))
    m, e = as_np(out)
    for i, (x, y) in enumerate(zip(xs, ys)):
        ref = P.sf_add(x, y)
        got = (int(m[i]), int(e[i]) if m[i] else 0)
        want = (ref.m, ref.e if ref.m else 0)
        assert got == want, (x, y, got, want)


def test_chained_adds_cdf_style():
    rng = np.random.default_rng(2)

    def chain(x):
        acc = SF.SFJ(x.m[..., 0], x.e[..., 0])
        outs_m = [acc.m]
        outs_e = [acc.e]
        for j in range(1, 4):
            acc = SF.sf_add(acc, SF.SFJ(x.m[..., j], x.e[..., j]))
            outs_m.append(acc.m)
            outs_e.append(acc.e)
        return jnp.stack(outs_m, -1), jnp.stack(outs_e, -1)

    chain_jit = jax.jit(chain)

    all_ps, all_refs = [], []
    for _ in range(2000):
        avail = rng.integers(0, 101, 4)
        if avail.sum() == 0:
            avail[0] = 1
        T = int(avail.sum())
        ps = [P.sf_div_int(int(a), T) for a in avail]
        accs_ref = [ps[0]]
        for j in range(1, 4):
            accs_ref.append(P.sf_add(accs_ref[-1], ps[j]))
        all_ps.append(ps)
        all_refs.append(accs_ref)

    ms_in = jnp.asarray([[p.m for p in ps] for ps in all_ps], jnp.uint64)
    es_in = jnp.asarray([[p.e for p in ps] for ps in all_ps], jnp.int32)
    ms, es = chain_jit(SF.SFJ(ms_in, es_in))
    ms = np.asarray(ms)
    es = np.asarray(es)
    for i, accs_ref in enumerate(all_refs):
        for j in range(4):
            ref = accs_ref[j]
            assert int(ms[i, j]) == ref.m and (
                int(es[i, j]) == ref.e or ref.m == 0), (i, j)


def test_sub_from_one():
    ys = _random_vals(4000, 3)
    out = jax.jit(jax.vmap(SF.sf_sub_from_one))(batch_sf(ys))
    m, e = as_np(out)
    for i, y in enumerate(ys):
        ref = P.sf_sub_from_one(y)
        got = (int(m[i]), int(e[i]) if m[i] else 0)
        want = (ref.m, ref.e if ref.m else 0)
        assert got == want, (y, got, want)


def test_sf_div():
    xs = _random_vals(4000, 4)
    ys = [v for v in _random_vals(5000, 5) if v.m][:4000]
    out = jax.jit(jax.vmap(SF.sf_div))(batch_sf(xs), batch_sf(ys))
    m, e = as_np(out)
    for i, (x, y) in enumerate(zip(xs, ys)):
        ref = P.sf_div(x, y)
        got = (int(m[i]), int(e[i]) if m[i] else 0)
        want = (ref.m, ref.e if ref.m else 0)
        assert got == want, (x, y, got, want)


def test_cmp_and_cents_and_f32():
    vals = _random_vals(6000, 6)
    rng = np.random.default_rng(7)
    us = rng.integers(0, 1 << 53, 6000).astype(np.uint64)
    x = batch_sf(vals)
    cmp = jax.jit(jax.vmap(SF.sf_cmp_le_u53))(x, jnp.asarray(us))
    cents = jax.jit(jax.vmap(SF.sf_cents))(x)
    f32 = jax.jit(jax.vmap(SF.sf_to_f32))(x)
    for i, v in enumerate(vals):
        assert bool(cmp[i]) == P.sf_cmp_le_u53(v, int(us[i])), (v, us[i])
        assert int(cents[i]) == P.sf_cents(v), v
        assert np.float32(f32[i]) == np.float32(P.sf_to_f32(v)), v
