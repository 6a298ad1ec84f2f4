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


# ---------------------------------------------------------------------------
# noise > 0 primitives: sf_mul / sf_from_int / sf_from_u53 / sf_round_int /
# IEEE bit pack-unpack (proto versions are spec-checked vs IEEE in
# test_exact32_proto.py)
# ---------------------------------------------------------------------------


def _random_sf(n, seed, emin=-62, emax=-48):
    import math
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        m = int(rng.integers(1 << 52, 1 << 53))
        e = int(rng.integers(emin, emax + 1)) - 52
        out.append(P.sf_from_float(math.ldexp(m, e)))
    return out


def test_mul():
    xs = _random_sf(4000, 10)
    ys = _random_sf(4000, 11)
    out = jax.jit(jax.vmap(SF.sf_mul))(batch_sf(xs), batch_sf(ys))
    m, e = as_np(out)
    for i, (x, y) in enumerate(zip(xs, ys)):
        ref = P.sf_mul(x, y)
        assert (int(m[i]), int(e[i]) if m[i] else 0) == (
            ref.m, ref.e if ref.m else 0), (x, y)


def test_from_int_u53_round_int():
    rng = np.random.default_rng(12)
    ts = rng.integers(0, 501, size=3000)
    us = rng.integers(0, 1 << 53, size=3000, dtype=np.uint64)
    us[:10] = 0
    ot = jax.jit(jax.vmap(SF.sf_from_int))(jnp.asarray(ts, jnp.int64))
    ou = jax.jit(jax.vmap(SF.sf_from_u53))(jnp.asarray(us, jnp.uint64))
    for i in range(len(ts)):
        r1 = P.sf_from_int(int(ts[i]))
        r2 = P.sf_from_u53(int(us[i]))
        assert (int(ot.m[i]), int(ot.e[i]) if ot.m[i] else 0) == (
            r1.m, r1.e if r1.m else 0)
        assert (int(ou.m[i]), int(ou.e[i]) if ou.m[i] else 0) == (
            r2.m, r2.e if r2.m else 0)
    # round-int over products t * acc (the sorting split's domain)
    accs = _random_sf(3000, 13, emin=-54, emax=-52)  # acc in (0.25, 2)
    prods = [P.sf_mul(P.sf_from_int(int(t)), a) for t, a in zip(ts, accs)]
    orr = jax.jit(jax.vmap(SF.sf_round_int))(batch_sf(prods))
    for i, p in enumerate(prods):
        assert int(orr[i]) == P.sf_round_int(p), (i, p)
    # ties
    for v, want in ((0.5, 0), (1.5, 2), (2.5, 2), (3.5, 4)):
        got = int(SF.sf_round_int(
            SF.SFJ(jnp.uint64(P.sf_from_float(v).m),
                   jnp.int32(P.sf_from_float(v).e))))
        assert got == want == round(v)


def test_bits_roundtrip_vs_numpy_view():
    xs = _random_sf(2000, 14) + [P.sf_zero(), P.sf_from_float(1.0),
                                 P.sf_from_float(0.75)]
    vals = np.asarray([P.sf_to_float(x) for x in xs], np.float64)
    bits = jax.jit(jax.vmap(SF.sf_to_bits))(batch_sf(xs))
    np.testing.assert_array_equal(np.asarray(bits), vals.view(np.uint64))
    back = jax.jit(jax.vmap(SF.sf_from_bits))(bits)
    m, e = as_np(back)
    for i, x in enumerate(xs):
        assert (int(m[i]), int(e[i]) if m[i] else 0) == (
            x.m, x.e if x.m else 0)
