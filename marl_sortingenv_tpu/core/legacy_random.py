"""Legacy global NumPy RandomState (MT19937) — bit-exact on device.

``Env_3_Monolith.step(mode='random')`` is the only consumer of the legacy
global stream (reference ``env_monolith.py:158,162`` via
``np.random.choice`` / ``np.random.randint``; seeded by ``set_seed`` at
``env_super.py:177``).  The 5-policy benchmark's "Random" scenario runs
through it, so parity of that scenario needs MT19937 + the legacy bounded
integer algorithm (mask rejection, *not* Lemire — the old RandomState
code path in ``numpy/random/src/distributions.c``).

Host-side seeding uses NumPy itself (``np.random.RandomState(seed)
.get_state()``); device code implements only the twist/temper stepping
and the masked bounded draw.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .rng import require_x64

U32 = jnp.uint32
I32 = jnp.int32

_N = 624
_M = 397
_MATRIX_A = np.uint32(0x9908B0DF)
_UPPER = np.uint32(0x80000000)
_LOWER = np.uint32(0x7FFFFFFF)


class MTState(NamedTuple):
    key: jax.Array  # u32[624]
    pos: jax.Array  # i32 (next index to read; 624 triggers a twist)


def mt19937_init(seed) -> MTState:
    """Equal to ``np.random.seed(seed)`` on the global stream (which the
    reference calls inside ``set_seed``, env_super.py:177).  Batched seeds
    produce a leading batch dimension."""
    require_x64()
    seeds = np.asarray(seed)
    flat = seeds.reshape(-1)
    keys = np.empty((flat.shape[0], _N), np.uint32)
    poss = np.empty(flat.shape[0], np.int32)
    for i, s in enumerate(flat):
        st = np.random.RandomState(int(s)).get_state()
        keys[i] = st[1]
        poss[i] = st[2]
    shape = seeds.shape
    return MTState(
        key=jnp.asarray(keys.reshape(shape + (_N,))),
        pos=jnp.asarray(poss.reshape(shape)),
    )


def _twist(key):
    """Full 624-word state regeneration.

    The canonical twist is an *in-place* ascending loop: for i >= N-M the
    ``mt[(i+M) % N]`` operand is a value already rewritten this round, and
    the final word reads the new ``mt[0]``.  Vectorized here in staged
    slices whose dependency depth is 3 (stride-227 recurrence)."""
    upper = jnp.asarray(_UPPER)
    lower = jnp.asarray(_LOWER)
    NM = _N - _M  # 227

    def part(y_hi, y_lo, km):
        y = (y_hi & upper) | (y_lo & lower)
        mag = jnp.where((y & U32(1)) == U32(1), jnp.asarray(_MATRIX_A), U32(0))
        return km ^ (y >> U32(1)) ^ mag

    old = key
    # i in [0, 227): km = old[i+397]
    s1 = part(old[0:NM], old[1:NM + 1], old[_M:_N])
    # i in [227, 454): km = new[i-227] = s1
    s2 = part(old[NM:2 * NM], old[NM + 1:2 * NM + 1], s1)
    # i in [454, 623): km = new[i-227] -> new indices [227, 396) = s2[:169]
    s3 = part(old[2 * NM:_N - 1], old[2 * NM + 1:_N], s2[: _N - 1 - 2 * NM])
    # i = 623: y_lo is the NEW mt[0]; km = new[396] = s2[169]
    s4 = part(old[_N - 1:_N], s1[0:1], s2[_M - NM - 1:_M - NM])
    return jnp.concatenate([s1, s2, s3, s4])


def next_uint32(s: MTState) -> Tuple[jax.Array, MTState]:
    need_twist = s.pos >= _N
    twisted = _twist(s.key)
    key = jnp.where(need_twist, twisted, s.key)
    pos = jnp.where(need_twist, 0, s.pos)
    y = key[pos]
    y = y ^ (y >> U32(11))
    y = y ^ ((y << U32(7)) & U32(0x9D2C5680))
    y = y ^ ((y << U32(15)) & U32(0xEFC60000))
    y = y ^ (y >> U32(18))
    return y, MTState(key=key, pos=pos + 1)


def legacy_randint(s: MTState, n) -> Tuple[jax.Array, MTState]:
    """``np.random.randint(0, n)`` / ``np.random.choice(n)`` (legacy,
    int64 dtype): mask rejection on 32-bit draws for ranges that fit in 32
    bits; ``n == 1`` consumes nothing."""
    rng = (jnp.asarray(n, I32) - 1).astype(U32)
    m = rng
    m = m | (m >> U32(1))
    m = m | (m >> U32(2))
    m = m | (m >> U32(4))
    m = m | (m >> U32(8))
    m = m | (m >> U32(16))

    def draw(s):
        v, s = next_uint32(s)
        return v & m, s

    v, s_nz = draw(s)

    def cond(c):
        v, s = c
        return jnp.any(v > rng)

    def body(c):
        v, s = c
        redraw = v > rng
        v2, s2 = draw(s)
        return (
            jnp.where(redraw, v2, v),
            jax.tree.map(lambda a, b: jnp.where(redraw, b, a), s, s2),
        )

    v, s_nz = lax.while_loop(cond, body, (v, s_nz))
    is_zero = rng == U32(0)
    val = jnp.where(is_zero, U32(0), v)
    s_out = jax.tree.map(lambda a, b: jnp.where(is_zero, a, b), s, s_nz)
    return val.astype(I32), s_out
