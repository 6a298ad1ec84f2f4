"""Pallas TPU kernel for the sorting redistribution hot loop.

The fast engine's ``_sort_material`` makes 12 sequential conditional
hypergeometric draws per step (4 stations x 3 conditional draws), each an
inverse-CDF over a 128-lane support.  This kernel fuses the entire
redistribution for a tile of environments into one VMEM-resident pass:
inputs are the per-station leftover counts and 12 pre-drawn uniforms per
environment; outputs are the post-redistribution leftovers and the
true/false splits.

Tile layout: (ENV_TILE, 128) blocks — ENV_TILE environments per program,
support along the 128-wide lane dimension.  Prefix product/sum along
lanes use Hillis-Steele doubling with ``pltpu.roll`` (lane rotations),
masked with 2D iota — no transcendentals, no cumsum lowering.

Equivalent in distribution to the reference's per-unit loop
(env_super.py:553-567); see ``core.fast`` for the derivation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
F32 = jnp.float32

ENV_TILE = 8
SUPPORT = 128


def _prefix(x, op, identity, support):
    """Hillis-Steele inclusive scan along the lane axis of (T, 128).

    Only lanes < ``support`` need a correct prefix (pmf beyond the
    static support bound is zero and the inverse-CDF comparison is
    masked to those lanes), so the doubling stops at ``support`` —
    log2(support) full-width rolls instead of log2(128)."""
    lane = jax.lax.broadcasted_iota(I32, x.shape, 1)
    s = 1
    while s < support:
        shifted = pltpu.roll(x, s, 1)
        x = op(x, jnp.where(lane >= s, shifted, identity))
        s *= 2
    return x


def _hg_tile(u, N, K, n, support):
    """Vector hypergeometric draw for a tile: all args (T,) except the
    support axis built internally; returns (T,) i32 draws.  ``support``
    is the static bound on hi = min(K, n) (core.fastb._support_for);
    lanes at and beyond it carry zero probability and are masked out of
    the inverse-CDF count, so the draw is bit-identical to the
    full-width scan."""
    T = u.shape[0]
    ks = jax.lax.broadcasted_iota(I32, (T, SUPPORT), 1)
    kf = ks.astype(F32)
    Nf = jnp.maximum(N, 1).astype(F32)[:, None]
    Kf = K.astype(F32)[:, None]
    nf = n.astype(F32)[:, None]
    lo = jnp.maximum(0, n - (N - K))[:, None]
    hi = jnp.minimum(K, n)[:, None]
    num = (Kf - kf) * (nf - kf)
    den = (kf + 1.0) * (Nf - Kf - nf + kf + 1.0)
    in_band = (ks >= lo) & (ks < hi)
    ratio = jnp.where(in_band, num / den, 1.0)
    pp = _prefix(ratio, jnp.multiply, F32(1.0), support)
    pmf = jnp.where(ks == 0, 1.0, pltpu.roll(pp, 1, 1))
    valid = (ks >= lo) & (ks <= hi)
    pmf = jnp.where(valid, pmf, 0.0)
    cdf = _prefix(pmf, jnp.add, F32(0.0), support)
    total = cdf[:, support - 1:support]
    x = jnp.sum(((cdf < u[:, None] * total) & (ks < support)).astype(I32),
                axis=1)
    return jnp.clip(x, lo[:, 0], hi[:, 0])


def _kernel(counts_ref, acc_ref, u_ref, leftover_ref, true_ref, false_ref,
            *, support):
    counts = counts_ref[:]          # (T, 4) i32 sorting-stage counts
    acc = acc_ref[:]                # (T, 4) f32 sorter accuracies
    u = u_ref[:]                    # (T, 12) f32 uniforms

    leftover = counts
    true_out = jnp.zeros_like(counts)
    false_out = jnp.zeros_like(counts)
    # column updates as iota-masked selects: ``.at[:, i].set`` /
    # ``jnp.stack`` lower to `scatter`, which Mosaic has no TC lowering
    # for (artifacts/pallas_ab.log) — selects lower fine
    col = jax.lax.broadcasted_iota(I32, counts.shape, 1)

    for i in range(4):
        target = leftover[:, i]
        true_val = jnp.rint(target.astype(F32) * acc[:, i]).astype(I32)
        false_val = target - true_val
        true_out = jnp.where(col == i, true_val[:, None], true_out)
        false_out = jnp.where(col == i, false_val[:, None], false_out)
        leftover = jnp.where(col == i, false_val[:, None], leftover)

        # conditional MVHG: 3 draws against categories 0..2, remainder to 3
        Ntot = jnp.sum(leftover, axis=1)
        n = jnp.minimum(false_val, Ntot)
        d0 = _hg_tile(u[:, 3 * i + 0], Ntot, leftover[:, 0], n, support)
        N1 = Ntot - leftover[:, 0]
        n1 = n - d0
        d1 = _hg_tile(u[:, 3 * i + 1], N1, leftover[:, 1], n1, support)
        N2 = N1 - leftover[:, 1]
        n2 = n1 - d1
        d2 = _hg_tile(u[:, 3 * i + 2], N2, leftover[:, 2], n2, support)
        d3 = n2 - d2
        removed = (jnp.where(col == 0, d0[:, None], 0)
                   + jnp.where(col == 1, d1[:, None], 0)
                   + jnp.where(col == 2, d2[:, None], 0)
                   + jnp.where(col == 3, d3[:, None], 0))
        leftover = leftover - removed

    leftover_ref[:] = leftover
    true_ref[:] = true_out
    false_ref[:] = false_out


@functools.partial(jax.jit,
                   static_argnames=("interpret", "support", "env_tile"))
def sort_redistribute(counts, acc, uniforms, interpret: bool = False,
                      support: int = SUPPORT, env_tile: int = ENV_TILE):
    """Batched redistribution: counts (N,4) i32, acc (N,4) f32,
    uniforms (N,12) f32 in [0,1).  Returns (leftover, true, false), each
    (N,4) i32.  N must be a multiple of ``env_tile``.  ``support`` is the
    static bound from ``core.fastb._support_for`` — draws are
    bit-identical to ``fastb.redistribute_u`` at the same support."""
    N = counts.shape[0]
    grid = (N // env_tile,)
    spec4 = pl.BlockSpec((env_tile, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    spec12 = pl.BlockSpec((env_tile, 12), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, support=support),
        grid=grid,
        in_specs=[spec4, spec4, spec12],
        out_specs=(spec4, spec4, spec4),
        out_shape=(
            jax.ShapeDtypeStruct((N, 4), I32),
            jax.ShapeDtypeStruct((N, 4), I32),
            jax.ShapeDtypeStruct((N, 4), I32),
        ),
        interpret=interpret,
    )(counts, acc, uniforms)
    return out
