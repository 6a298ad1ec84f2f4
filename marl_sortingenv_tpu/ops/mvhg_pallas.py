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


def _prefix(x, op, identity):
    """Hillis-Steele inclusive scan along the lane axis of (T, 128)."""
    lane = jax.lax.broadcasted_iota(I32, x.shape, 1)
    s = 1
    while s < SUPPORT:
        shifted = pltpu.roll(x, s, 1)
        x = op(x, jnp.where(lane >= s, shifted, identity))
        s *= 2
    return x


def _hg_tile(u, N, K, n):
    """Vector hypergeometric draw for a tile: all args (T,) except the
    support axis built internally; returns (T,) i32 draws."""
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
    pp = _prefix(ratio, jnp.multiply, F32(1.0))
    pmf = jnp.where(ks == 0, 1.0, pltpu.roll(pp, 1, 1))
    valid = (ks >= lo) & (ks <= hi)
    pmf = jnp.where(valid, pmf, 0.0)
    cdf = _prefix(pmf, jnp.add, F32(0.0))
    total = cdf[:, SUPPORT - 1][:, None]
    x = jnp.sum((cdf < u[:, None] * total).astype(I32), axis=1)
    return jnp.clip(x, lo[:, 0], hi[:, 0])


def _kernel(counts_ref, acc_ref, u_ref, leftover_ref, true_ref, false_ref):
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
        d0 = _hg_tile(u[:, 3 * i + 0], Ntot, leftover[:, 0], n)
        N1 = Ntot - leftover[:, 0]
        n1 = n - d0
        d1 = _hg_tile(u[:, 3 * i + 1], N1, leftover[:, 1], n1)
        N2 = N1 - leftover[:, 1]
        n2 = n1 - d1
        d2 = _hg_tile(u[:, 3 * i + 2], N2, leftover[:, 2], n2)
        d3 = n2 - d2
        removed = (jnp.where(col == 0, d0[:, None], 0)
                   + jnp.where(col == 1, d1[:, None], 0)
                   + jnp.where(col == 2, d2[:, None], 0)
                   + jnp.where(col == 3, d3[:, None], 0))
        leftover = leftover - removed

    leftover_ref[:] = leftover
    true_ref[:] = true_out
    false_ref[:] = false_out


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_redistribute(counts, acc, uniforms, interpret: bool = False):
    """Batched redistribution: counts (N,4) i32, acc (N,4) f32,
    uniforms (N,12) f32 in [0,1).  Returns (leftover, true, false), each
    (N,4) i32.  N must be a multiple of ENV_TILE."""
    N = counts.shape[0]
    grid = (N // ENV_TILE,)
    spec4 = pl.BlockSpec((ENV_TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    spec12 = pl.BlockSpec((ENV_TILE, 12), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
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
