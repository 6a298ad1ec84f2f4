"""Fused Pallas TPU kernel for ``core.fastb._sort_material``'s hot core.

Reference behavior: ``env_super.py`` ``sort_material`` — each of the 4
sorting stations splits its belt segment into correctly/incorrectly
sorted units (rint(target*accuracy)), then redistributes the mis-sorted
units over the remaining stations by a multivariate hypergeometric draw.
The XLA path (``fastb._sort_material`` + ``fastb.redistribute_u``)
implements this as ~300 small serial VPU ops per step: an 8-deep
threefry split chain, 12 uniform draws, and 12 inverse-CDF
hypergeometric samples — at 4096 envs it is latency-bound on op issue,
not on arithmetic (63% of the event-mode step, artifacts/ablate3.log).

This kernel runs the WHOLE chain — threefry RNG and sampler — in one
``pallas_call``: everything stays in VMEM/registers, one dispatch, no
fusion boundaries.  Bitwise-identical to the XLA path by construction:

* the threefry2x32 implementation reproduces jax.random's partitionable
  semantics exactly (``split(key, n)`` row i = block with 64-bit counter
  (0, i); 32-bit ``random_bits`` word = o0 ^ o1 of block (0, 0); uniform
  = bitcast((bits >> 9) | 0x3f800000) - 1) — validated bitwise against
  ``jax.random`` in ``artifacts/threefry_proto.py`` and in
  ``tests/test_sort_pallas.py``;
* the sampler mirrors ``fastb._hypergeom_u`` op for op, including the
  Hillis-Steele prefix-product/-sum association, so float rounding is
  identical.

Layout: the env batch N is reshaped to (BS, 128) = (sublanes, lanes) so
every vector op runs with full 8x128 VPU utilization (a (2, N) op wastes
6/8 sublanes; a (2, BS, 128) op wastes none).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
I32 = jnp.int32
F32 = jnp.float32

_ROT_EVEN = (13, 15, 26, 6)
_ROT_ODD = (17, 29, 16, 24)
_ROTS = (_ROT_EVEN, _ROT_ODD, _ROT_EVEN, _ROT_ODD, _ROT_EVEN)


def _rotl(x, r):
    return (x << U32(r)) | (x >> U32(32 - r))


def _threefry(k0, k1, c0, c1):
    """threefry2x32 block(s): keys/counters broadcastable u32 arrays.

    Bit-exact mirror of jax._src.prng.threefry2x32 (validated in
    artifacts/threefry_proto.py)."""
    ks = (k0, k1, k0 ^ k1 ^ U32(0x1BD11BDA))
    x0 = c0 + ks[0]
    x1 = c1 + ks[1]
    for grp in range(5):
        for r in _ROTS[grp]:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x0 ^ x1
        i = grp + 1
        x0 = x0 + ks[i % 3]
        x1 = x1 + ks[(i + 1) % 3] + U32(i)
    return x0, x1


def _bits_to_unit_f32(bits):
    """jax.random.uniform's bits->[0,1) conversion, bit-exact."""
    f = lax.bitcast_convert_type((bits >> U32(9)) | U32(0x3F800000), F32)
    return f - F32(1.0)


def _roll0(x, s):
    """Circular shift by s along the (untiled) leading axis — pure
    permutation, bit-exact equivalent of jnp.roll(x, s, axis=0).
    Static slices only (dynamic_slice doesn't lower in Mosaic)."""
    m = x.shape[0]
    head = lax.slice_in_dim(x, m - s, m, axis=0)
    tail = lax.slice_in_dim(x, 0, m - s, axis=0)
    return jnp.concatenate([head, tail], axis=0)


def _prefix_prod0(x):
    """fastb._prefix_prod0 with identical Hillis-Steele association."""
    idx = lax.broadcasted_iota(I32, x.shape, 0)
    s = 1
    while s < x.shape[0]:
        x = x * jnp.where(idx >= s, _roll0(x, s), F32(1.0))
        s *= 2
    return x


def _prefix_sum0(x):
    idx = lax.broadcasted_iota(I32, x.shape, 0)
    s = 1
    while s < x.shape[0]:
        x = x + jnp.where(idx >= s, _roll0(x, s), F32(0.0))
        s *= 2
    return x


def _hg_u(u, N, K, n, support):
    """fastb._hypergeom_u op-for-op on (BS, L) operands with a
    (support, BS, L) pmf."""
    Nf = jnp.maximum(N, 1).astype(F32)[None]
    ks = lax.broadcasted_iota(I32, (support,) + u.shape, 0)
    kf = ks.astype(F32)
    Kf = K.astype(F32)[None]
    nf = n.astype(F32)[None]
    lo = jnp.maximum(0, n - (N - K))
    hi = jnp.minimum(K, n)
    num = (Kf - kf) * (nf - kf)
    den = (kf + 1.0) * (Nf - Kf - nf + kf + 1.0)
    in_band = (ks >= lo[None]) & (ks < hi[None])
    ratio = jnp.where(in_band, num / den, F32(1.0))
    pp = _prefix_prod0(ratio)
    pmf = jnp.concatenate([jnp.ones((1,) + u.shape, F32), pp[:-1]], axis=0)
    valid = (ks >= lo[None]) & (ks <= hi[None])
    pmf = jnp.where(valid, pmf, F32(0.0))
    cdf = _prefix_sum0(pmf)
    last = lax.squeeze(
        lax.slice_in_dim(cdf, support - 1, support, axis=0), (0,))
    us = u * last
    x = jnp.sum((cdf < us[None]).astype(I32), axis=0)
    return jnp.clip(x, lo, hi)


def _kernel(counts_ref, acc_ref, key_ref, leftover_ref, true_ref,
            false_ref, newkey_ref, *, support):
    k0 = key_ref[0]                       # (BS, L) u32
    k1 = key_ref[1]

    # ONE lax.fori_loop over the 4 stations (round 5 — the unrolled form
    # emitted the station body 4x and dominated Mosaic compile time; see
    # step_pallas._kernel section 4 for the bitwise argument).  Each
    # iteration: the exact _sort_material key chain for one station
    # (split2 -> split3 -> 3 uniforms) then the 3 inverse-CDF draws.
    shape2 = (2,) + k0.shape
    shape3 = (3,) + k0.shape
    lo2 = lax.broadcasted_iota(U32, shape2, 0)
    lo3 = lax.broadcasted_iota(U32, shape3, 0)
    z2 = jnp.zeros(shape2, U32)
    z3 = jnp.zeros(shape3, U32)
    lv0 = jnp.stack([counts_ref[i] for i in range(4)])
    accs = jnp.stack([acc_ref[i] for i in range(4)])
    rows4 = lax.broadcasted_iota(I32, lv0.shape, 0)

    def station(st_i, carry):
        k0, k1, lv, tarr, farr = carry
        o0, o1 = _threefry(k0[None], k1[None], z2, lo2)    # split2
        k0n, k1n = o0[0], o1[0]
        s0, s1 = o0[1], o1[1]
        p0, p1 = _threefry(s0[None], s1[None], z3, lo3)    # split3
        q0, q1 = _threefry(p0, p1, z3, z3)                 # 3 x bits(0,0)
        u = _bits_to_unit_f32(q0 ^ q1)
        sel_i = rows4 == st_i
        target = lv[0]
        acc_i = accs[0]
        for j in (1, 2, 3):                # pure select chain, bit-exact
            pick = st_i == j
            target = jnp.where(pick, lv[j], target)
            acc_i = jnp.where(pick, accs[j], acc_i)
        true_val = jnp.rint(target.astype(F32) * acc_i).astype(I32)
        false_val = target - true_val
        tarr = jnp.where(sel_i, true_val[None], tarr)
        farr = jnp.where(sel_i, false_val[None], farr)
        lv = jnp.where(sel_i, false_val[None], lv)
        # _mvhg4_u over the 4 leftover categories
        N = lv[0] + lv[1] + lv[2] + lv[3]
        n = jnp.minimum(false_val, N)
        d0 = _hg_u(u[0], N, lv[0], n, support)
        N1 = N - lv[0]
        n1 = n - d0
        d1 = _hg_u(u[1], N1, lv[1], n1, support)
        N2 = N1 - lv[1]
        n2 = n1 - d1
        d2 = _hg_u(u[2], N2, lv[2], n2, support)
        d3 = n2 - d2
        lv = lv - jnp.stack([d0, d1, d2, d3]).astype(I32)
        return k0n, k1n, lv, tarr, farr

    k0, k1, lv, tarr, farr = lax.fori_loop(
        0, 4, station, (k0, k1, lv0, jnp.zeros_like(lv0),
                        jnp.zeros_like(lv0)))
    newkey_ref[0] = k0
    newkey_ref[1] = k1
    for i in range(4):
        leftover_ref[i] = lv[i]
        true_ref[i] = tarr[i]
        false_ref[i] = farr[i]


_TILE = 64  # sublane rows (= 8192 envs) per grid program; the sampler's
# ~6 live (support, TILE, 128) f32 pmf/cdf buffers are ~3 MB at
# support=16 — comfortably inside the ~16 MB/core VMEM budget.


def _tile_for(bs: int) -> int:
    """Largest divisor of ``bs`` that is <= _TILE (grid programs must
    cover the sublane axis exactly)."""
    for t in range(min(bs, _TILE), 0, -1):
        if bs % t == 0:
            return t
    return 1


def pjit_auto_sharded(x) -> bool:
    """True when ``x`` is being partitioned by XLA's AUTO SPMD
    partitioner — a pjit/NamedSharding jit context NOT under
    ``jax.shard_map``.  A ``pallas_call`` there is opaque to the
    partitioner and would be lowered replicated (silently all-gathering
    the env batch through the kernel), so the caller must fall back to
    the XLA path.  Under shard_map the block is manual (the aval's
    varying-mesh-axes set is non-empty) and the kernel is safe
    per-shard — the production multi-chip path
    (``parallel/fastb_shard.py``).  Conservative: a replicated input on
    a multi-device auto mesh also returns True."""
    try:
        t = jax.typeof(x)
        mesh = t.sharding.mesh
        return (not mesh.empty) and mesh.size > 1 and not t.vma
    except AttributeError:
        # Fail SAFE, not open: if a JAX upgrade renames the aval's
        # .sharding/.vma introspection, degrade to the XLA fallback
        # whenever a multi-device context is plausible rather than
        # silently re-enabling the SPMD-opaque kernel (the silent
        # batch-replication this guard exists to prevent).  A committed
        # multi-device sharding on the concrete array is itself the
        # unsafe case; failing that, any multi-device process is treated
        # as potentially auto-sharded.
        try:
            s = getattr(x, "sharding", None)
            if s is not None and getattr(s, "num_devices", 1) > 1:
                return True
            return len(jax.devices()) > 1
        except Exception:
            return True


def supported(n_envs: int) -> bool:
    """The kernel requires the env batch to fill whole 128-lane rows.
    There is no upper cap: batches larger than one tile's 8192 envs run
    as a grid of independent per-tile programs (each env column is
    computed identically whichever program owns it, so tiling does not
    change a single bit)."""
    return n_envs % 128 == 0 and n_envs >= 128


@partial(jax.jit, static_argnames=("support", "interpret"))
def sort_material_fused(counts, acc, keys, support=16, interpret=False):
    """Fused _sort_material core.

    counts: i32[4, N]; acc: f32[4, N]; keys: u32[N, 2] (fastb layout).
    Returns (leftover, true_arr, false_arr) i32[4, N] and new_keys
    u32[N, 2] — bitwise-identical to drawing the 12 uniforms through
    fastb's _vsplit/_vuniform chain and calling fastb.redistribute_u.
    """
    n = counts.shape[1]
    if not supported(n):
        raise ValueError(
            f"n_envs={n} unsupported: the kernel needs n_envs % 128 == 0 "
            "and n_envs >= 128 (whole 128-lane rows)")
    bs = n // 128
    tile = _tile_for(bs)
    c3 = counts.reshape(4, bs, 128)
    a3 = acc.reshape(4, bs, 128)
    k3 = keys.T.reshape(2, bs, 128)

    # under jax.shard_map (parallel.fastb_shard runs the kernel per env
    # shard) outputs inherit the inputs' varying-mesh-axes set; outside
    # shard_map this is the empty set and a no-op
    vma = jax.typeof(counts).vma
    out_shape = [
        jax.ShapeDtypeStruct((4, bs, 128), jnp.int32, vma=vma),
        jax.ShapeDtypeStruct((4, bs, 128), jnp.int32, vma=vma),
        jax.ShapeDtypeStruct((4, bs, 128), jnp.int32, vma=vma),
        jax.ShapeDtypeStruct((2, bs, 128), jnp.uint32, vma=vma),
    ]

    def blk(rows):
        return pl.BlockSpec((rows, tile, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    leftover, true_arr, false_arr, newkey = pl.pallas_call(
        partial(_kernel, support=support),
        grid=(bs // tile,),
        out_shape=out_shape,
        in_specs=[blk(4), blk(4), blk(2)],
        out_specs=[blk(4), blk(4), blk(4), blk(2)],
        interpret=interpret,
    )(c3, a3, k3)
    return (leftover.reshape(4, n), true_arr.reshape(4, n),
            false_arr.reshape(4, n), newkey.reshape(2, n).T)
