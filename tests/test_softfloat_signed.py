"""Signed softfloat (SFS) verification: correctly-rounded f64 signed
addition, clip, and IEEE bit encoding — exhaustive-adversarial vs NumPy
on CPU (where hardware f64 is IEEE).

These ops carry the exact on-device reward arithmetic: press-reward
sums, sort+press totals, and the cumulative episode return.
"""

import numpy as np
import jax
import jax.numpy as jnp

from marl_sortingenv_tpu.core import softfloat as SF


def decompose(v):
    v = np.float64(v)
    if v == 0.0:
        return 0, np.uint64(0), 0
    s = -1 if v < 0 else 1
    m, e = np.frexp(abs(v))
    m53 = np.uint64(m * (1 << 53))
    return s, m53, int(e) - 53


def to_sfs(v):
    s, m, e = decompose(v)
    return SF.SFS(jnp.asarray(s, jnp.int32), jnp.asarray(m, jnp.uint64),
                  jnp.asarray(e, jnp.int32))


def value(x: SF.SFS) -> float:
    return float(int(x.s)) * float(int(x.m)) * 2.0 ** int(x.e)


ADD = jax.jit(SF.sfs_add)
CLIP = jax.jit(SF.sfs_clip1)
BITS = jax.jit(SF.sfs_to_bits)


def check_add(a, b):
    r = ADD(to_sfs(a), to_sfs(b))
    got = value(r)
    want = np.float64(a) + np.float64(b)
    assert got == want, (a, b, got, float(want))
    # sign discipline: s == 0 iff zero
    assert (int(r.s) == 0) == (got == 0.0), (a, b)


def test_add_adversarial_pairs():
    cases = [
        (1.0, 1.0), (1.0, -1.0), (1.0, -0.5), (0.5, -1.0),
        (0.0, 0.0), (0.0, -0.25), (-0.25, 0.0),
        # massive cancellation
        (1.0, -(1.0 - 2**-53)), (1.0 + 2**-52, -1.0),
        # far operands (sticky-only effect), both signs
        (1.0, 2**-60), (1.0, -2**-60), (-1.0, 2**-60),
        # tie-breaking at half ulp
        (1.0, 2**-53), (1.0, -2**-54), (1.0 + 2**-52, 2**-53),
        (1.5, 2**-53), (1.5, -2**-53),
        # carries
        (1.0 - 2**-53, 2**-53), ((2 - 2**-52) * 2, (2 - 2**-52) * 2),
        # typical reward magnitudes
        (0.5, -0.2), (0.3333333333333333, -1.0), (-0.5, -0.5),
        (0.8957835778211, -0.12345678901234567),
    ]
    for a, b in cases:
        check_add(a, b)
        check_add(b, a)


def test_add_random_fuzz_vectorized():
    rng = np.random.default_rng(0)
    n = 200_000
    # exponents spanning the reward domain (2^-62 .. 2^9) plus zeros
    ea = rng.integers(-62, 9, n)
    eb = rng.integers(-62, 9, n)
    ma = rng.random(n) + 1.0
    mb = rng.random(n) + 1.0
    a = np.ldexp(ma, ea) * rng.choice([-1.0, 1.0], n)
    b = np.ldexp(mb, eb) * rng.choice([-1.0, 1.0], n)
    a[rng.random(n) < 0.01] = 0.0
    b[rng.random(n) < 0.01] = 0.0
    # nearby magnitudes to stress cancellation paths
    close = rng.random(n) < 0.3
    b[close] = -a[close] * (1.0 + rng.integers(-4, 5, n)[close] * 2.0**-52)

    def dec(v):
        s = np.where(v == 0, 0, np.where(v < 0, -1, 1)).astype(np.int32)
        m, e = np.frexp(np.abs(v))
        m53 = (m * (1 << 53)).astype(np.uint64)
        m53 = np.where(v == 0, np.uint64(0), m53)
        e = np.where(v == 0, 0, e - 53).astype(np.int32)
        return SF.SFS(jnp.asarray(s), jnp.asarray(m53), jnp.asarray(e))

    r = jax.jit(jax.vmap(SF.sfs_add))(dec(a), dec(b))
    got = (np.asarray(r.s, np.float64)
           * np.ldexp(np.asarray(r.m, np.float64), np.asarray(r.e)))
    want = a + b
    bad = got != want
    assert not bad.any(), (a[bad][:5], b[bad][:5], got[bad][:5], want[bad][:5])
    bits = np.asarray(jax.jit(jax.vmap(SF.sfs_to_bits))(r))
    np.testing.assert_array_equal(bits, want.view(np.uint64))


def test_clip1():
    for v in [0.0, 0.3, -0.3, 1.0, -1.0, 1.0000000000000002,
              -1.0000000000000002, 2.5, -3.7, 2**-60]:
        r = CLIP(to_sfs(v))
        assert value(r) == float(np.clip(v, -1.0, 1.0)), v


def test_bits_encoding():
    for v in [0.0, 1.0, -1.0, 0.5, -0.2, 1.0 - 2**-53, 2**-62,
              0.8957835778211, -0.755081337596291]:
        bits = int(BITS(to_sfs(v)))
        assert np.uint64(bits) == np.float64(v).view(np.uint64), v
