"""Bit-exact NumPy ``Generator``/PCG64 random streams on device.

The reference environment's parity contract depends on five independent
``np.random.default_rng`` (PCG64) streams plus the input generator's own
stream (reference ``src/envs_train/env_super.py:165-184`` and
``utils/input_generator.py:26-30``).  To reproduce reference trajectories
bit-exactly under ``jit``/``vmap`` we re-implement, in pure JAX uint64
arithmetic:

* the PCG64 (XSL-RR 128/64) bit generator, including NumPy's buffered
  ``next_uint32`` (low half first, high half cached),
* ``Generator.integers(low, high)``  — Lemire bounded rejection on uint64,
* ``Generator.random()`` / ``uniform`` — ``(next_uint64 >> 11) * 2**-53``,
* ``random_interval(max)``           — mask rejection on buffered uint32
  (consumed by ``Generator.shuffle`` / ``permutation``),
* ``Generator.choice(n, p=...)``     — f64 cdf + ``searchsorted('right')``
  on a single ``random()`` draw.

Seeding (``SeedSequence`` hashing) is done host-side by NumPy itself via
:func:`pcg64_init`; only the stepping runs on device, so the device code
never needs the seed-sequence hash.

Everything here is written against *scalar* stream state and is vmappable:
under ``vmap`` the rejection ``while_loop``s become masked lock-step loops
(rejection probability is ~2**-60 for our ranges, so they converge in one
iteration essentially always) and ``lax.cond`` becomes a select — lanes
that logically skip a draw keep their previous state via ``where``.

Requires x64 mode; importing this module enables it.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def require_x64():
    """Parity mode runs in u64/f64; enable x64 lazily on first use so that
    importing the package does not poison the fast (f32/i32) TPU path —
    the tunneled TPU runtime emulates f64 at ~49-bit precision and takes
    minutes to compile x64 graphs, so fast mode must stay x64-free."""
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)

U64 = jnp.uint64
U32 = jnp.uint32
I64 = jnp.int64
F64 = jnp.float64

# PCG 128-bit LCG default multiplier, split into two u64 limbs.
_PCG_MULT_HI = np.uint64(2549297995355413924)
_PCG_MULT_LO = np.uint64(4865540595714422341)

_D_2POW53_INV = np.float64(1.0 / 9007199254740992.0)  # 2**-53


class PCG64State(NamedTuple):
    """One PCG64 bit-generator stream (NumPy-compatible).

    ``has_uint32``/``uinteger`` mirror NumPy's buffered 32-bit draw: a
    ``next_uint32`` returns the *low* half of a fresh 64-bit draw and caches
    the high half for the next 32-bit request (the cache survives
    intervening 64-bit draws), matching ``numpy/random/src/pcg64/pcg64.h``.
    """

    state_hi: jax.Array  # u64
    state_lo: jax.Array  # u64
    inc_hi: jax.Array    # u64
    inc_lo: jax.Array    # u64
    has_uint32: jax.Array  # bool
    uinteger: jax.Array    # u32
    fence: jax.Array       # u64, always 0 — runtime rounding fence (see fence_f64)


def pcg64_init(seed) -> PCG64State:
    """Host-side seeding: identical to ``np.random.default_rng(seed)``.

    NumPy itself performs the SeedSequence hash; we lift the resulting
    128-bit state/increment into u64 limb arrays.  ``seed`` may be a scalar
    or any array of seeds (leading batch dims are preserved).
    """
    require_x64()
    seeds = np.asarray(seed)
    flat = seeds.reshape(-1)
    n = flat.shape[0]
    sh = np.empty(n, np.uint64)
    sl = np.empty(n, np.uint64)
    ih = np.empty(n, np.uint64)
    il = np.empty(n, np.uint64)
    mask = (1 << 64) - 1
    for k, s in enumerate(flat):
        st = np.random.PCG64(int(s)).state["state"]
        sh[k] = (st["state"] >> 64) & mask
        sl[k] = st["state"] & mask
        ih[k] = (st["inc"] >> 64) & mask
        il[k] = st["inc"] & mask
    shape = seeds.shape
    return PCG64State(
        state_hi=jnp.asarray(sh.reshape(shape)),
        state_lo=jnp.asarray(sl.reshape(shape)),
        inc_hi=jnp.asarray(ih.reshape(shape)),
        inc_lo=jnp.asarray(il.reshape(shape)),
        has_uint32=jnp.zeros(shape, bool),
        uinteger=jnp.zeros(shape, U32),
        fence=jnp.zeros(shape, U64),
    )


def _mulhi64(a, b):
    """High 64 bits of the 128-bit product a*b (u64 limb arithmetic)."""
    mask32 = U64(0xFFFFFFFF)
    a0 = a & mask32
    a1 = a >> U64(32)
    b0 = b & mask32
    b1 = b >> U64(32)
    t = a1 * b0 + ((a0 * b0) >> U64(32))
    w1 = t & mask32
    w2 = t >> U64(32)
    t = a0 * b1 + w1
    return a1 * b1 + w2 + (t >> U64(32))


def _step(s: PCG64State) -> PCG64State:
    """state = state * PCG_MULT + inc  (mod 2**128)."""
    lo = s.state_lo * _PCG_MULT_LO
    hi = (
        s.state_hi * _PCG_MULT_LO
        + s.state_lo * _PCG_MULT_HI
        + _mulhi64(s.state_lo, _PCG_MULT_LO)
    )
    lo2 = lo + s.inc_lo
    carry = (lo2 < lo).astype(U64)
    hi2 = hi + s.inc_hi + carry
    return s._replace(state_hi=hi2, state_lo=lo2)


def _output_xsl_rr(hi, lo):
    rot = hi >> U64(58)
    v = hi ^ lo
    return (v >> rot) | (v << ((U64(0) - rot) & U64(63)))


def next_uint64(s: PCG64State) -> Tuple[jax.Array, PCG64State]:
    """One 64-bit draw: step the LCG, then XSL-RR output (NumPy order)."""
    s = _step(s)
    return _output_xsl_rr(s.state_hi, s.state_lo), s


def next_uint32(s: PCG64State) -> Tuple[jax.Array, PCG64State]:
    """Buffered 32-bit draw (low half first, high half cached)."""
    v64, s_fresh = next_uint64(s)
    fresh_val = (v64 & U64(0xFFFFFFFF)).astype(U32)
    cached_val = s.uinteger
    use_cache = s.has_uint32
    val = jnp.where(use_cache, cached_val, fresh_val)
    new = PCG64State(
        state_hi=jnp.where(use_cache, s.state_hi, s_fresh.state_hi),
        state_lo=jnp.where(use_cache, s.state_lo, s_fresh.state_lo),
        inc_hi=s.inc_hi,
        inc_lo=s.inc_lo,
        has_uint32=jnp.where(use_cache, jnp.zeros_like(use_cache), jnp.ones_like(use_cache)),
        uinteger=jnp.where(use_cache, s.uinteger, (v64 >> U64(32)).astype(U32)),
        fence=s.fence,
    )
    return val, new


def next_double(s: PCG64State) -> Tuple[jax.Array, PCG64State]:
    """``Generator.random()``: 53-bit mantissa double in [0, 1)."""
    v, s = next_uint64(s)
    return (v >> U64(11)).astype(F64) * _D_2POW53_INV, s


def fence_f64(x, zero_u64):
    """Identity on ``x`` that the backend provably cannot see through.

    XLA:CPU's emitter contracts ``add(mul(a, b), c)`` into an FMA
    regardless of ``optimization_barrier``, ``--xla_cpu_enable_fast_math``
    or ``--xla_allow_excess_precision`` (verified empirically on this
    jaxlib), which changes the f64 rounding and breaks bit-parity with
    NumPy's separate multiply-then-add.  Routing the product through
    ``bitcast -> + runtime_zero -> bitcast`` defeats the pattern match:
    ``zero_u64`` is a *runtime* input (``PCG64State.fence``), so LLVM
    cannot fold the integer add and the following fadd no longer consumes
    an fmul."""
    bits = lax.bitcast_convert_type(jnp.asarray(x, F64), U64)
    return lax.bitcast_convert_type(bits + zero_u64, F64)


def fmul(a, b, zero_u64):
    """f64 product rounded separately (never FMA-contracted downstream)."""
    return fence_f64(jnp.asarray(a, F64) * jnp.asarray(b, F64), zero_u64)


def fdiv(a, b, zero_u64):
    """True f64 division.  XLA folds division by a *constant* into
    multiplication by its reciprocal (different rounding than NumPy's
    divsd); fencing the divisor makes it a runtime value so a real divide
    is emitted."""
    return jnp.asarray(a, F64) / fence_f64(b, zero_u64)


def uniform(s: PCG64State, low, high) -> Tuple[jax.Array, PCG64State]:
    """``Generator.uniform(low, high)`` for scalars: low + (high-low)*random().
    The product is fenced: NumPy rounds it before the add, so an FMA here
    would diverge in the last ulp."""
    d, s = next_double(s)
    rng = jnp.asarray(high, F64) - jnp.asarray(low, F64)
    return jnp.asarray(low, F64) + fmul(rng, d, s.fence), s


def _lemire32(s: PCG64State, rng) -> Tuple[jax.Array, PCG64State]:
    """NumPy ``buffered_bounded_lemire_uint32``: bounded draw on the
    *buffered* 32-bit stream.  ``rng`` (u32, possibly traced) is the
    inclusive range-1; ``rng == 0`` consumes no draws and returns 0
    (``numpy/random/src/distributions.c`` — the 32-bit branch of
    ``random_bounded_uint64_fill``, taken whenever the range fits in
    32 bits, i.e. every bounded draw the reference makes)."""
    rng = jnp.asarray(rng, U32)
    rng_excl = rng + U32(1)  # wraps to 0 if rng==0xffffffff (unused here)
    threshold = (U32(0xFFFFFFFF) - rng) % rng_excl

    def draw(s):
        v32, s = next_uint32(s)
        m = v32.astype(U64) * rng_excl.astype(U64)
        return m, s

    m, s_nz = draw(s)

    def cond(carry):
        m, s = carry
        return jnp.any((m & U64(0xFFFFFFFF)).astype(U32) < threshold)

    def body(carry):
        m, s = carry
        redraw = (m & U64(0xFFFFFFFF)).astype(U32) < threshold
        m2, s2 = draw(s)
        return (
            jnp.where(redraw, m2, m),
            jax.tree.map(lambda a, b: jnp.where(redraw, b, a), s, s2),
        )

    m, s_nz = lax.while_loop(cond, body, (m, s_nz))
    val_nz = (m >> U64(32)).astype(U32)
    is_zero = rng == U32(0)
    val = jnp.where(is_zero, U32(0), val_nz)
    s_out = jax.tree.map(lambda a, b: jnp.where(is_zero, a, b), s, s_nz)
    return val, s_out


def _lemire64(s: PCG64State, rng) -> Tuple[jax.Array, PCG64State]:
    """NumPy ``bounded_lemire_uint64`` for ranges that do not fit in 32
    bits (not used by the reference dynamics; kept for API completeness)."""
    rng = jnp.asarray(rng, U64)
    rng_excl = rng + U64(1)
    threshold = (U64(0) - rng_excl) % rng_excl

    def draw(s):
        v, s = next_uint64(s)
        return _mulhi64(v, rng_excl), v * rng_excl, s

    m_hi, m_lo, s = draw(s)

    def cond(carry):
        m_hi, m_lo, s = carry
        return jnp.any(m_lo < threshold)

    def body(carry):
        m_hi, m_lo, s = carry
        redraw = m_lo < threshold
        n_hi, n_lo, s2 = draw(s)
        return (
            jnp.where(redraw, n_hi, m_hi),
            jnp.where(redraw, n_lo, m_lo),
            jax.tree.map(lambda a, b: jnp.where(redraw, b, a), s, s2),
        )

    m_hi, m_lo, s = lax.while_loop(cond, body, (m_hi, m_lo, s))
    return m_hi, s


def integers(s: PCG64State, low, high) -> Tuple[jax.Array, PCG64State]:
    """``Generator.integers(low, high)`` (endpoint-exclusive, int64 dtype).

    Dispatches like NumPy's ``random_bounded_uint64_fill``: ranges that fit
    in 32 bits take the buffered 32-bit Lemire path; larger static ranges
    take the 64-bit path.  Traced (dynamic) bounds always use the 32-bit
    path — every dynamic range in the reference is <= 22."""
    if isinstance(low, int) and isinstance(high, int) and high - low - 1 > 0xFFFFFFFF:
        v, s = _lemire64(s, np.uint64(high - low - 1))
        return jnp.asarray(low, I64) + v.astype(I64), s
    low = jnp.asarray(low, I64)
    rng32 = (jnp.asarray(high, I64) - low - 1).astype(U32)
    v, s = _lemire32(s, rng32)
    return low + v.astype(I64), s


def random_interval32(s: PCG64State, mx) -> Tuple[jax.Array, PCG64State]:
    """``random_interval(max)`` for max in [0, 2**32): mask rejection on
    buffered uint32 draws (``numpy/random/src/distributions.c``).

    This is the primitive behind ``Generator.shuffle``/``permutation``.
    ``max`` is inclusive.  A max of 0 consumes no draws and returns 0.
    """
    mx = jnp.asarray(mx, U32)
    m = mx
    m = m | (m >> U32(1))
    m = m | (m >> U32(2))
    m = m | (m >> U32(4))
    m = m | (m >> U32(8))
    m = m | (m >> U32(16))

    def nonzero(s):
        def draw(s):
            v, s = next_uint32(s)
            return v & m, s

        v, s = draw(s)

        def cond(carry):
            v, s = carry
            return jnp.any(v > mx)

        def body(carry):
            v, s = carry
            redraw = v > mx
            v2, s2 = draw(s)
            return (
                jnp.where(redraw, v2, v),
                jax.tree.map(lambda a, b: jnp.where(redraw, b, a), s, s2),
            )

        v, s = lax.while_loop(cond, body, (v, s))
        return v, s

    v_nz, s_nz = nonzero(s)
    is_zero = mx == U32(0)
    val = jnp.where(is_zero, U32(0), v_nz)
    s_out = jax.tree.map(lambda a, b: jnp.where(is_zero, a, b), s, s_nz)
    return val, s_out


def shuffle_consume(s: PCG64State, n: int) -> PCG64State:
    """Advance the stream exactly as ``Generator.shuffle`` of an n-element
    sequence would (n is static), discarding the permutation itself.

    The reference shuffles each 100-unit input batch
    (``utils/input_generator.py:61``) but only the per-material *counts*
    feed the dynamics — order never matters, so consuming the draws is
    sufficient for parity of every later draw.
    """

    def body(k, s):
        i = (jnp.asarray(n, I64) - 1 - k).astype(U32)  # i = n-1 .. 1
        _, s = random_interval32(s, i)
        return s

    return lax.fori_loop(0, n - 1, body, s)


def choice_p(s: PCG64State, p) -> Tuple[jax.Array, PCG64State]:
    """``Generator.choice(len(p), p=p)`` for a probability vector ``p``
    (f64): cdf = cumsum(p); cdf /= cdf[-1]; one ``random()`` draw;
    ``searchsorted(cdf, u, side='right')``.

    The cumsum is built *sequentially* (NumPy's order); XLA's parallel
    prefix-sum would associate differently and flip last-ulp comparisons.
    Requires a static-length ``p`` (always 4 in the reference's hot loop).
    """
    p = jnp.asarray(p, F64)
    n = p.shape[0]
    acc = p[0]
    terms = [acc]
    for i in range(1, n):
        acc = acc + p[i]
        terms.append(acc)
    cdf = jnp.stack(terms)
    cdf = cdf / cdf[-1]
    u, s = next_double(s)
    idx = jnp.sum((cdf <= u).astype(I64))
    return idx, s


def choice_n(s: PCG64State, n) -> Tuple[jax.Array, PCG64State]:
    """``Generator.choice(n)`` (uniform, no p): one Lemire integers draw."""
    return integers(s, 0, n)
