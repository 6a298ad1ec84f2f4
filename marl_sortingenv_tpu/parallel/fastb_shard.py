"""Data parallelism for the batch-last production engine (``core.fastb``).

The reference is single-process CPU (SURVEY.md §2.8); ``parallel.mesh``
covers the per-env ``fast`` engine whose vmapped state shards its LEADING
axis over ``dp``.  The production ``fastb`` engine stores the env batch on
the LAST axis of every state leaf (counts ``i32[4, N]``, bales
``i16[5, MAX, N]`` — see ``core/fastb.py:73-107``), so it needs
trailing-axis ``PartitionSpec``s — and its fused Pallas sort kernel
(``ops/sort_pallas.py``) is opaque to XLA's SPMD partitioner, so the env
step is wrapped in ``jax.shard_map`` instead of relying on sharding
propagation: inside the shard_map body every state leaf is a per-shard
local array, the kernel runs independently per shard (each shard keeps
``n_local % 128 == 0``), and no collective is ever needed because env
instances are physically independent (reference ``env_super.py`` holds
exactly one plant).

Bitwise story: every RNG draw in the engine is keyed per env instance
(``fastb._vsplit`` over the ``u32[N, 2]`` key leaf), so a shard computes
exactly the bits the unsharded program computes for its slice — sharded
== unsharded bit-for-bit (asserted for both bale modes in
``tests/test_sharding.py``).  The policy-sampling draws OUTSIDE the step
(``learn/ppo.collect_rollout``) are shape-(N,) draws from one key, which
jax's partitionable threefry keeps sharding-invariant.

Multi-host: the same specs over a global mesh from
``parallel.distributed.global_mesh`` — each host computes only its env
columns (``tests/test_multiprocess.py`` runs this 2-process).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.fastb import BState, BStepOut


def bstate_pspec(st: BState, axis: str = "dp") -> BState:
    """PartitionSpecs for a BState: every leaf sharded on its TRAILING
    (env) axis, except ``key`` which is batch-first ``u32[N, 2]``; the
    unused bale-representation leaves (``None`` in the current mode) pass
    through as ``None``."""
    kw = {}
    for name, x in zip(BState._fields, st):
        if x is None:
            kw[name] = None
        elif name == "key":
            kw[name] = P(axis)
        else:
            kw[name] = P(*([None] * (x.ndim - 1)), axis)
    return BState(**kw)


def out_pspec(axis: str = "dp") -> BStepOut:
    """BStepOut leaves are batch-FIRST (obs ``f32[N, d]``, rest ``[N]``)."""
    return BStepOut(*(P(axis) for _ in BStepOut._fields))


def shard_bstate(mesh: Mesh, st: BState, axis: str = "dp") -> BState:
    """Place a BState on the mesh with trailing-axis env sharding."""
    specs = bstate_pspec(st, axis)
    # None leaves (the unused bale representation) are dropped by pytree
    # flattening in both trees, so a plain tree_map never sees them
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), st, specs)


def shard_step(mesh: Mesh, step, st_example: BState, axis: str = "dp"):
    """Wrap a batched fastb step ``(st, action) -> (st, out)`` in
    ``jax.shard_map`` over the env axis.

    ``step`` may close over (traced) parameters — e.g. the frozen sort
    policy inside ``fastb.step_press`` — which shard_map treats as
    replicated.  The returned callable expects/returns arrays laid out
    per ``bstate_pspec``/``out_pspec``; the Pallas sort kernel (if
    enabled) runs per shard, so ``n_envs / mesh.shape[axis]`` must
    itself satisfy ``ops.sort_pallas.supported`` for the kernel path."""
    sspec = bstate_pspec(st_example, axis)
    return jax.shard_map(
        step, mesh=mesh,
        in_specs=(sspec, P(axis)),
        out_specs=(sspec, out_pspec(axis)),
    )


def shard_train_state(mesh: Mesh, ts, axis: str = "dp"):
    """Place a ``learn.ppo.TrainState`` holding a fastb BState: env state
    trailing-axis sharded, per-env accumulators and obs batch-first
    sharded, learner params/optimizer/key replicated (gradients are
    reduced by XLA from the dp-sharded minibatches)."""
    rep = NamedSharding(mesh, P())
    dp0 = NamedSharding(mesh, P(axis))
    put = jax.device_put
    return ts._replace(
        params=jax.tree.map(lambda x: put(x, rep), ts.params),
        opt_state=jax.tree.map(lambda x: put(x, rep), ts.opt_state),
        env_state=shard_bstate(mesh, ts.env_state, axis),
        obs=put(ts.obs, dp0),
        key=put(ts.key, rep),
        ep_return_acc=put(ts.ep_return_acc, dp0),
        last_ep_return=put(ts.last_ep_return, dp0),
        update_count=put(ts.update_count, rep),
    )
