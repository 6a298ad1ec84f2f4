"""Device mesh and sharding layout.

The reference is single-process CPU (SURVEY.md §2.8); this module is the
TPU-native scaling layer it lacks:

* ``dp`` axis — env-batch data parallelism: every env instance is
  independent, so the batched ``EnvState`` shards its leading axis over
  ``dp`` with zero communication during rollout; the only collectives are
  the gradient/metric all-reduces XLA inserts when the (replicated)
  parameters are updated from dp-sharded minibatches.  These ride ICI
  within a slice.
* ``tp`` axis — tensor-parallel hooks for the policy MLP (hidden dim
  sharded column-then-row wise).  At the reference's 32x32 policy size
  this is not profitable; the axis exists so larger policies drop in
  (SURVEY.md §2.8 "provide mesh axis hooks anyway").

Multi-host: ``jax.distributed.initialize()`` + the same code — mesh
construction uses all global devices; per-host env shards follow from the
``dp`` sharding of the state batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    """Build a ('dp', 'tp') mesh over the given/available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % tp == 0, (n_devices, tp)
    return Mesh(devices.reshape(n_devices // tp, tp), ("dp", "tp"))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading env-batch axis over dp, replicated over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(mesh: Mesh, state):
    """Place a batched env-state pytree with its leading axis over dp."""
    sh = env_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)


def params_pspec(params, tp_shard: bool = False):
    """PartitionSpecs for ACParams: replicated, or hidden-dim TP-sharded
    (layer0 columns / layer1 rows over 'tp')."""
    if not tp_shard:
        return jax.tree.map(lambda _: P(), params)

    from ..models.mlp import ACParams, Dense

    def tower(tower_params):
        out = []
        for i, lyr in enumerate(tower_params):
            if i == 0:
                out.append(Dense(P(None, "tp"), P("tp")))
            else:
                out.append(Dense(P("tp", None), P()))
        return tuple(out)

    return ACParams(
        pi=tower(params.pi),
        vf=tower(params.vf),
        action=Dense(P(), P()),
        value=Dense(P(), P()),
    )


def shard_params(mesh: Mesh, params, tp_shard: bool = False):
    specs = params_pspec(params, tp_shard)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
