"""JAX port of the exact32 soft-float kernel (integer-only IEEE-f64
emulation for the narrow domain the plant needs).

Executable spec / oracle: ``exact32_proto.py`` (validated bit-exact vs
IEEE f64 over the reachable domain).  This port uses only u64/i64 integer
ops, so it is bit-exact on the TPU as well (whose *hardware* f64 is only
~49-bit) — the foundation for TPU-exact trajectories.

Domain contracts (asserted by the callers):
* ``sf_div_int``: 0 <= a <= 2^20, 1 <= b <= 2^20
* values handled elsewhere lie in [2^-62, 4) or are exactly 0
* ``sf_cmp_le_u53``: u in [0, 2^53)

Representation: ``(m, e)`` with value = m * 2^e, m == 0 (zero) or
m in [2^52, 2^53).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

U64 = jnp.uint64
I64 = jnp.int64
I32 = jnp.int32

MBITS = 52
MLOW = np.uint64(1 << 52)
MHIGH = np.uint64(1 << 53)


class SFJ(NamedTuple):
    m: jax.Array  # u64: 0 or in [2^52, 2^53)
    e: jax.Array  # i32


def sf_zero():
    return SFJ(jnp.zeros((), U64), jnp.zeros((), I32))


def sf_one():
    return SFJ(jnp.asarray(MLOW), jnp.asarray(-52, I32))


def _bitlen(x):
    """Bit length of u64 via 6-step binary search (0 for x == 0)."""
    n = jnp.zeros((), I32) if x.ndim == 0 else jnp.zeros(x.shape, I32)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (U64(1) << U64(s))
        n = n + jnp.where(big, I32(s), I32(0))
        x = jnp.where(big, x >> U64(s), x)
    return n + jnp.where(x > 0, I32(1), I32(0))


def _round_half_even(q, rem, den):
    """q (+ rem/den) rounded to nearest-even, overflow-safe (compares
    rem against den-rem instead of doubling rem)."""
    other = den - rem
    up = (rem > other) | ((rem == other) & ((q & U64(1)) == U64(1)))
    return q + up.astype(U64)


def sf_div_int(a, b) -> SFJ:
    """Correctly-rounded f64 of a/b (a <= 2^10-ish, 1 <= b <= 2^10).

    One u64 division with a post-normalization derived from the remainder
    (no second divide): q0 = (a << p0)//b with p0 = 52 + bl(b) - bl(a)
    lands in [2^51, 2^53); if below 2^52, refine with one extra quotient
    bit from the doubled remainder."""
    a = jnp.asarray(a, U64)
    b = jnp.asarray(b, U64)
    bl_a = _bitlen(jnp.maximum(a, U64(1)))
    bl_b = _bitlen(b)
    p0 = (I32(52) + bl_b - bl_a).astype(U64)  # <= 52 + 10 in-domain
    num = a << p0
    q0 = num // b
    rem0 = num - q0 * b
    small = q0 < MLOW
    bit = (U64(2) * rem0) // b
    rem1 = U64(2) * rem0 - bit * b
    q = jnp.where(small, U64(2) * q0 + bit, q0)
    rem = jnp.where(small, rem1, rem0)
    p = jnp.where(small, p0 + U64(1), p0)
    q = _round_half_even(q, rem, b)
    carry = q == MHIGH
    q = jnp.where(carry, MLOW, q)
    e_out = (jnp.where(carry, U64(1), U64(0)).astype(I32)
             - p.astype(I32))
    zero = a == U64(0)
    return SFJ(jnp.where(zero, U64(0), q),
               jnp.where(zero, I32(0), e_out))


def sf_add(x: SFJ, y: SFJ) -> SFJ:
    """Correctly-rounded f64 addition of non-negative values."""
    # order so that x >= y (zero sorts below everything)
    xkey = jnp.where(x.m == U64(0), I32(-(1 << 20)), x.e)
    ykey = jnp.where(y.m == U64(0), I32(-(1 << 20)), y.e)
    swap = (xkey < ykey) | ((xkey == ykey) & (x.m < y.m))
    xm = jnp.where(swap, y.m, x.m)
    xe = jnp.where(swap, y.e, x.e)
    ym = jnp.where(swap, x.m, y.m)
    ye = jnp.where(swap, x.e, y.e)

    d = (xe - ye).astype(U64)
    far = d > U64(MBITS + 2)
    d_eff = jnp.where(far, U64(0), d)  # masked out below

    X = xm << U64(2)
    Yfull = ym << U64(2)
    Y = Yfull >> d_eff
    sticky = (Yfull & ((U64(1) << d_eff) - U64(1))) != U64(0)
    S = X + jnp.where(far | (ym == U64(0)), U64(0), Y)
    sticky = sticky & ~far & (ym != U64(0))
    e = xe
    over = S >= (MHIGH << U64(2))
    sticky = sticky | (over & ((S & U64(1)) != U64(0)))
    S = jnp.where(over, S >> U64(1), S)
    e = jnp.where(over, e + 1, e)
    q = S >> U64(2)
    g = S & U64(3)
    up = (g > U64(2)) | ((g == U64(2)) & sticky) | (
        (g == U64(2)) & ~sticky & ((q & U64(1)) == U64(1)))
    q = q + up.astype(U64)
    carry = q == MHIGH
    q = jnp.where(carry, MLOW, q)
    e = jnp.where(carry, e + 1, e)
    # zero handling
    x_zero = xm == U64(0)
    return SFJ(jnp.where(x_zero, U64(0), q), jnp.where(x_zero, I32(0), e))


def sf_sub_from_one(y: SFJ) -> SFJ:
    """Correctly-rounded f64 of 1 - value(y), y in [0, 1], value >= 2^-62."""
    d = (-y.e).astype(U64)  # one = 2^d in units of 2^{y.e}; d in [52, 62]
    one = U64(1) << d
    diff = one - y.m  # exact, < 2^63
    bl = _bitlen(diff)
    drop = (bl - 53).clip(0).astype(U64)
    q = diff >> drop
    rem = diff - (q << drop)
    den = U64(1) << drop
    q = _round_half_even(q, rem, den)
    carry = q == MHIGH
    q = jnp.where(carry, q >> U64(1), q)
    e = y.e + drop.astype(I32) + carry.astype(I32)
    # upshift if diff had fewer than 53 bits
    up = (53 - bl).clip(0).astype(U64)
    q = q << jnp.where(drop > U64(0), U64(0), up)
    e = e - jnp.where(drop > U64(0), I32(0), up.astype(I32))
    is_zero = diff == U64(0)
    y_zero = y.m == U64(0)
    m_out = jnp.where(is_zero, U64(0), jnp.where(y_zero, MLOW, q))
    e_out = jnp.where(is_zero, I32(0), jnp.where(y_zero, I32(-52), e))
    return SFJ(m_out, e_out)


def _div128by64(hi, lo, d):
    """(hi*2^64 + lo) // d and remainder, for hi < d and d in [2^63, 2^64).

    Hacker's Delight ``divlu`` (Knuth D) with 32-bit digits; the
    correction loops run at most twice."""
    B = U64(1) << U64(32)
    dh = d >> U64(32)
    dl = d & (B - U64(1))
    un1 = lo >> U64(32)
    un0 = lo & (B - U64(1))

    def fix(q, r, u_low):
        def bad_of(q, r, done):
            return (~done) & (r < B) & (
                (q >= B) | (q * dl > (r << U64(32)) + u_low))

        def cond(c):
            q, r, done = c
            return jnp.any(bad_of(q, r, done))

        def body(c):
            q, r, done = c
            bad = bad_of(q, r, done)
            q2 = jnp.where(bad, q - U64(1), q)
            r2 = jnp.where(bad, r + dh, r)
            return q2, r2, done | (r2 >= B)

        q, r, _ = lax.while_loop(cond, body, (q, r, jnp.zeros_like(q, bool)))
        return q, r

    q1 = jnp.minimum(hi // dh, B - U64(1))
    r1 = hi - q1 * dh
    q1, r1 = fix(q1, r1, un1)
    un21 = (hi << U64(32)) + un1 - q1 * d  # exact mod 2^64 (true value < 2^64)
    q0 = jnp.minimum(un21 // dh, B - U64(1))
    r0 = un21 - q0 * dh
    q0, r0 = fix(q0, r0, un0)
    r = (un21 << U64(32)) + un0 - q0 * d  # exact mod 2^64
    q = (q1 << U64(32)) | q0
    return q, r


def sf_div(x: SFJ, y: SFJ) -> SFJ:
    """Correctly-rounded f64 division x/y (positive, y normalized)."""
    # normalize divisor to [2^63, 2^64) with shift 11; scale the dividend
    # by the same shift: x.m * 2^53 * 2^11 = x.m * 2^64 => (hi, lo) = (x.m, 0)
    hi = x.m
    lo = jnp.zeros_like(x.m)
    d = y.m << U64(11)
    q, r = _div128by64(hi, lo, d)
    # q in [2^52, 2^54): normalize
    e = x.e - y.e - I32(53)
    big = q >= MHIGH
    bit = q & U64(1)
    q_half = q >> U64(1)
    # halved value's fraction is (bit*d + r)/(2d): up iff bit & (r>0 or odd)
    up_big = (bit == U64(1)) & ((r > U64(0)) | ((q_half & U64(1)) == U64(1)))
    q_big = q_half + up_big.astype(U64)
    q_small = _round_half_even(q, r, d)
    q = jnp.where(big, q_big, q_small)
    e = jnp.where(big, e + 1, e)
    carry = q == MHIGH
    q = jnp.where(carry, MLOW, q)
    e = jnp.where(carry, e + 1, e)
    zero = x.m == U64(0)
    return SFJ(jnp.where(zero, U64(0), q), jnp.where(zero, I32(0), e))


def sf_cmp_le_u53(x: SFJ, u) -> jax.Array:
    """Exact value(x) <= u * 2^-53 for u in [0, 2^53); x in domain."""
    u = jnp.asarray(u, U64)
    s = x.e + I32(53)
    pos = s >= 0
    lhs = x.m << jnp.where(pos, s, 0).astype(U64)
    rhs_shift = jnp.where(pos, 0, -s).astype(U64)
    # guard: for x >= 2^-62, -s <= 9'ish... allow up to 10; larger means
    # x is far below u's resolution -> compare via saturation
    big_shift = rhs_shift > U64(10)
    rhs = u << jnp.where(big_shift, U64(10), rhs_shift)
    cmp = jnp.where(pos, lhs <= u, x.m <= rhs)
    # big_shift: x very small; x <= u*2^k for k >= 10 unless u == 0
    cmp = jnp.where(big_shift, u > U64(0), cmp)
    return jnp.where(x.m == U64(0), True, cmp)


def sf_cents(x: SFJ) -> jax.Array:
    """int(rint(f64(value*100))) — both roundings (np_round2 numerator)."""
    p = x.m * U64(100)
    bl = _bitlen(p)
    shift = (bl - 53).clip(0).astype(U64)
    pm = p >> shift
    rem = p - (pm << shift)
    pm = _round_half_even(pm, rem, U64(1) << shift)
    ovf = pm == MHIGH
    pm = jnp.where(ovf, pm >> U64(1), pm)
    shift = shift + ovf.astype(U64)
    e = x.e + shift.astype(I32)
    neg = e < 0
    s2 = jnp.where(neg, -e, 0).astype(U64)
    s2c = jnp.minimum(s2, U64(63))
    q = pm >> s2c
    rem = pm - (q << s2c)
    q = _round_half_even(q, rem, U64(1) << s2c)
    q = jnp.where(neg, q, pm << jnp.where(neg, U64(0), e.clip(0).astype(U64)))
    return jnp.where(x.m == U64(0), I64(0), q.astype(I64))


def sf_to_f32_parts(x: SFJ) -> Tuple[jax.Array, jax.Array]:
    """(mant24, exp) with f32 value = mant24 * 2^exp (mant24 in [2^23, 2^24))."""
    drop = U64(53 - 24)
    q = x.m >> drop
    rem = x.m - (q << drop)
    q = _round_half_even(q, rem, U64(1) << drop)
    carry = q == (U64(1) << U64(24))
    q = jnp.where(carry, U64(1) << U64(23), q)
    e = x.e + I32(29) + carry.astype(I32)
    return q, e


def sf_to_f32(x: SFJ) -> jax.Array:
    """f32(correctly-rounded-f64 value) — exactly numpy's f64->f32 cast.
    Built from integer parts, so exact even where hardware f64 is not."""
    q, e = sf_to_f32_parts(x)
    val = jnp.ldexp(q.astype(jnp.float32), e)
    return jnp.where(x.m == U64(0), jnp.float32(0), val)


# ---------------------------------------------------------------------------
# Signed layer: SFS = (sign, magnitude) for exact reward arithmetic.
# Rewards mix signs (penalties vs bonuses), so the exact engine needs
# correctly-rounded signed add.  Magnitudes stay in the SFJ domain.
# ---------------------------------------------------------------------------

class SFS(NamedTuple):
    s: jax.Array  # i32 in {-1, 0, +1} (0 iff magnitude is zero)
    m: jax.Array  # u64 as SFJ
    e: jax.Array  # i32 as SFJ


def sfs_zero():
    return SFS(jnp.zeros((), I32), jnp.zeros((), U64), jnp.zeros((), I32))


def sfs_from_parts(s, m, e) -> SFS:
    return SFS(jnp.asarray(s, I32), jnp.asarray(m, U64), jnp.asarray(e, I32))


def sfs_of(x: SFJ, sign=1) -> SFS:
    s = jnp.where(x.m == U64(0), I32(0), I32(sign))
    return SFS(s, x.m, x.e)


def _mag_gt(xm, xe, ym, ye):
    """value(x) > value(y) for normalized magnitudes (m in [2^52, 2^53))."""
    return (xe > ye) | ((xe == ye) & (xm > ym))


def _sub_mag(xm, xe, ym, ye) -> SFJ:
    """Correctly-rounded x - y for magnitudes with value(x) > value(y) > 0.

    Three guard bits; the dropped fraction of y becomes a borrow plus a
    sticky remainder (true diff = S + g with g in [0,1) of a guard unit;
    g > 0 only when the exponent gap >= 2, in which case no massive
    cancellation is possible and the result keeps >= 53 bits)."""
    d = (xe - ye).astype(U64)
    far = d > U64(55)
    d_eff = jnp.where(far, U64(0), d)
    X3 = xm << U64(3)
    Y3full = ym << U64(3)
    Y3 = jnp.where(far, U64(0), Y3full >> d_eff)
    f_nz = jnp.where(
        far, True, (Y3full & ((U64(1) << d_eff) - U64(1))) != U64(0))
    S = X3 - Y3 - f_nz.astype(U64)
    sticky = f_nz

    bl = _bitlen(S)
    drop = (bl - 53).clip(0).astype(U64)
    q = S >> drop
    rem = S & ((U64(1) << drop) - U64(1))
    half = jnp.where(drop > U64(0), U64(1) << (drop - U64(1)), U64(0))
    tie = (drop > U64(0)) & (rem == half)
    up = (rem > half) | (tie & (sticky | ((q & U64(1)) == U64(1))))
    q = q + up.astype(U64)
    carry = q == MHIGH
    q = jnp.where(carry, MLOW, q)
    e = xe - I32(3) + drop.astype(I32) + carry.astype(I32)
    # fewer than 53 bits: exact upshift (sticky is provably 0 here)
    upshift = (I32(53) - bl).clip(0).astype(U64)
    low = drop == U64(0)
    q = jnp.where(low, S << upshift, q)
    e = jnp.where(low, xe - I32(3) - upshift.astype(I32), e)
    zero = S == U64(0)
    return SFJ(jnp.where(zero, U64(0), q), jnp.where(zero, I32(0), e))


def sfs_add(x: SFS, y: SFS) -> SFS:
    """Correctly-rounded f64 signed addition."""
    x_zero = x.s == I32(0)
    y_zero = y.s == I32(0)

    same = x.s == y.s
    mag_sum = sf_add(SFJ(x.m, x.e), SFJ(y.m, y.e))

    x_big = _mag_gt(x.m, x.e, y.m, y.e)
    y_big = _mag_gt(y.m, y.e, x.m, x.e)
    bm = jnp.where(x_big, x.m, y.m)
    be = jnp.where(x_big, x.e, y.e)
    sm = jnp.where(x_big, y.m, x.m)
    se = jnp.where(x_big, y.e, x.e)
    mag_diff = _sub_mag(bm, be, sm, se)
    diff_sign = jnp.where(x_big, x.s, jnp.where(y_big, y.s, I32(0)))
    # equal magnitudes, opposite signs -> exactly +0
    eq = ~x_big & ~y_big
    mag_diff = SFJ(jnp.where(eq, U64(0), mag_diff.m),
                   jnp.where(eq, I32(0), mag_diff.e))

    s = jnp.where(same, x.s, diff_sign)
    m = jnp.where(same, mag_sum.m, mag_diff.m)
    e = jnp.where(same, mag_sum.e, mag_diff.e)
    s = jnp.where(m == U64(0), I32(0), s)

    s = jnp.where(x_zero, y.s, jnp.where(y_zero, x.s, s))
    m = jnp.where(x_zero, y.m, jnp.where(y_zero, x.m, m))
    e = jnp.where(x_zero, y.e, jnp.where(y_zero, x.e, e))
    return SFS(s, m, e)


def sfs_clip1(x: SFS) -> SFS:
    """clip(value, -1, 1) — exact (|v| > 1 iff (e, m) > (-52, 2^52))."""
    over = (x.e > I32(-52)) | ((x.e == I32(-52)) & (x.m > MLOW))
    return SFS(x.s,
               jnp.where(over, jnp.asarray(MLOW), x.m),
               jnp.where(over, I32(-52), x.e))


def sfs_to_bits(x: SFS) -> jax.Array:
    """IEEE-754 f64 bit pattern (domain: normals only, plus +0)."""
    biased = (x.e + I32(52) + I32(1023)).astype(U64)
    bits = (biased << U64(52)) | (x.m - MLOW)
    bits = bits | jnp.where(x.s < 0, U64(1) << U64(63), U64(0))
    return jnp.where(x.s == I32(0), U64(0), bits)


def sfs_to_f64(x: SFS) -> jax.Array:
    """Value as host-faithful f64 via exact integer reconstruction.
    Only bit-reliable where hardware f64 is IEEE (CPU); on TPU use
    sfs_to_bits and decode on the host."""
    mag = jnp.ldexp(x.m.astype(jnp.float64), x.e)
    return jnp.where(x.s < 0, -mag, mag)


# ---------------------------------------------------------------------------
# noise > 0 extension (proto: exact32_proto.sf_mul etc.): general multiply
# via 32-bit-limb 128-bit product, exact int / next_double injection,
# Python-round to int, and IEEE-bit pack/unpack so exact f64 values can
# live in u64 state fields (TPU f64 is ~49-bit and cannot store them).
# ---------------------------------------------------------------------------


def _mul128(a, b):
    """Full 128-bit product of two u64 as (hi, lo) via 32-bit limbs."""
    mask = U64(0xFFFFFFFF)
    ah, al = a >> U64(32), a & mask
    bh, bl = b >> U64(32), b & mask
    lo = al * bl
    m1 = ah * bl
    m2 = al * bh
    hi = ah * bh
    lo1 = lo + (m1 << U64(32))
    c1 = (lo1 < lo).astype(U64)
    lo2 = lo1 + (m2 << U64(32))
    c2 = (lo2 < lo1).astype(U64)
    hi = hi + (m1 >> U64(32)) + (m2 >> U64(32)) + c1 + c2
    return hi, lo2


def sf_mul(x: SFJ, y: SFJ) -> SFJ:
    """Correctly-rounded f64 multiply (non-negative normalized operands).

    p = x.m * y.m is in [2^104, 2^106), so hi = p >> 64 is in [2^40, 2^42)
    and the normalization shift is 52 or 53 — always inside lo."""
    hi, lo = _mul128(x.m, y.m)
    shift = (_bitlen(hi) + I32(64) - I32(53)).astype(U64)
    q = (hi << (U64(64) - shift)) | (lo >> shift)
    rem = lo & ((U64(1) << shift) - U64(1))
    q = _round_half_even(q, rem, U64(1) << shift)
    carry = q == MHIGH
    q = jnp.where(carry, jnp.asarray(MLOW), q)
    e = x.e + y.e + shift.astype(I32) + carry.astype(I32)
    zero = (x.m == U64(0)) | (y.m == U64(0))
    return SFJ(jnp.where(zero, U64(0), q), jnp.where(zero, I32(0), e))


def sf_from_int(t) -> SFJ:
    """Exact SFJ of a non-negative integer < 2^53."""
    t = jnp.asarray(t).astype(U64)
    sh = (I32(53) - _bitlen(t)).clip(0, 63).astype(U64)
    zero = t == U64(0)
    return SFJ(jnp.where(zero, U64(0), t << sh),
               jnp.where(zero, I32(0), -sh.astype(I32)))


def sf_from_u53(u) -> SFJ:
    """Exact SFJ of u * 2^-53 for u in [0, 2^53) — ``next_double``."""
    x = sf_from_int(u)
    return SFJ(x.m, jnp.where(x.m == U64(0), I32(0), x.e - I32(53)))


def sf_round_int(x: SFJ) -> jax.Array:
    """Python ``round(value(x))`` -> i64: half-to-even on the f64 value
    (non-negative, value < 2^53).  s >= 54 means value < 1/2 -> 0, which
    the clamped shift also produces (m < 2^53 < 2^54 - m)."""
    pos = x.e >= 0
    s = jnp.clip(-x.e, 0, 54).astype(U64)
    q = x.m >> s
    rem = x.m & ((U64(1) << s) - U64(1))
    q = _round_half_even(q, rem, U64(1) << s)
    q = jnp.where(pos, x.m << jnp.clip(x.e, 0, 10).astype(U64), q)
    return jnp.where(x.m == U64(0), U64(0), q).astype(I64)


def sf_to_bits(x: SFJ) -> jax.Array:
    """IEEE-754 f64 bit pattern of the (non-negative) value — normals and
    +0 only (the plant's domain; subnormals unreachable)."""
    biased = (x.e + I32(52) + I32(1023)).astype(U64)
    bits = (biased << U64(52)) | (x.m - jnp.asarray(MLOW))
    return jnp.where(x.m == U64(0), U64(0), bits)


def sf_from_bits(bits) -> SFJ:
    """Inverse of sf_to_bits (non-negative normals + zero)."""
    bits = jnp.asarray(bits, U64)
    m = (bits & U64((1 << 52) - 1)) | jnp.asarray(MLOW)
    e = (bits >> U64(52)).astype(I32) - I32(1075)
    zero = bits == U64(0)
    return SFJ(jnp.where(zero, U64(0), m), jnp.where(zero, I32(0), e))
