"""Multi-host glue (SURVEY.md §2.8: the reference has no distributed
backend; the TPU build's communication layer is JAX collectives over
ICI/DCN).

On a multi-host TPU slice every host runs the same program:

    from marl_sortingenv_tpu.parallel import distributed
    distributed.initialize()          # jax.distributed.initialize()
    mesh = distributed.global_mesh()  # all global devices on ('dp','tp')

Env shards live per host automatically: constructing the batched env
state with ``make_global_env_state`` places each host's local shard of
the leading dp axis, and the learner's replicated parameters all-reduce
over ICI within the slice (XLA inserts the collectives from the
shardings — no explicit psum code is needed for the DP learner).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` wrapper so the same program runs
    1-host and N-host.

    * explicit coordinator → real multi-process init (the 2-process CPU
      test ``tests/test_multiprocess.py`` exercises this path);
    * no args on a cluster (TPU pod / SLURM / k8s) → auto-detection via
      ``jax.distributed.initialize()``;
    * no args on a plain single machine → single-process mode (the
      auto-detect attempt finds no cluster and is swallowed).
    """
    # detect an already-initialized distributed client WITHOUT touching the
    # backend (jax.process_count() would initialize XLA, after which
    # jax.distributed.initialize refuses to run)
    from jax._src import distributed as _jdist

    if getattr(_jdist.global_state, "client", None) is not None:
        return  # already initialized by the launcher
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
        return
    if num_processes is not None and num_processes > 1:
        raise ValueError(
            "coordinator_address is required for multi-process init")
    try:
        # cluster auto-detection (TPU pod metadata, SLURM, ...)
        jax.distributed.initialize()
    except Exception:
        pass  # no cluster environment detected -> single-process mode


def global_mesh(tp: int = 1) -> Mesh:
    return make_mesh(len(jax.devices()), tp=tp)


def make_global_env_state(cfg, reset_fn, n_envs_global: int, mesh: Mesh):
    """Build a dp-sharded global env-state batch where each process
    creates only its local shard (``jax.make_array_from_process_local_data``)."""
    n_local = n_envs_global // jax.process_count()
    local = reset_fn(cfg, n_local, jax.process_index() * n_local)
    sharding = NamedSharding(mesh, P("dp"))

    def globalize(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x),
            (n_envs_global,) + tuple(np.shape(x)[1:]))

    return jax.tree.map(globalize, local)


def make_global_bstate(cfg, reset_fn, n_envs_global: int, mesh: Mesh):
    """Production-engine (``core.fastb``) variant of
    ``make_global_env_state``: leaves are batch-LAST (the key leaf is
    batch-first), so each leaf shards the axis its
    ``parallel.fastb_shard.bstate_pspec`` names.  Each process builds
    only its own env columns."""
    from .fastb_shard import bstate_pspec

    n_local = n_envs_global // jax.process_count()
    local = reset_fn(cfg, n_local, jax.process_index() * n_local)
    specs = bstate_pspec(local)

    def globalize(x, s):
        x = np.asarray(x)
        idx = list(s).index("dp")
        gshape = list(x.shape)
        gshape[idx] = n_envs_global
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, s), x, tuple(gshape))

    return jax.tree.map(globalize, local, specs)
