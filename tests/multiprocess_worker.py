"""Worker for the real 2-process ``jax.distributed`` test (SURVEY.md §2.8
"Multi-host execution").  Run as a subprocess::

    python tests/multiprocess_worker.py <coordinator> <num_procs> <pid> <out.npz>

Each process owns 4 virtual CPU devices; with 2 processes the global mesh
is 8 devices — the same mesh the single-process sharding tests use, so the
resulting parameters can be compared bitwise across the two launch modes.

The global env state is built in fixed 8-env chunks so its content is
identical no matter how many processes construct it (each process builds
only the chunks of the dp axis it owns, via
``parallel.distributed.make_global_env_state``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
# 4 devices per process with 2 processes, 8 with 1: global mesh is always
# the same 8 CPU devices, so results must be bitwise comparable
_NPROCS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={8 // _NPROCS}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

N_ENVS_GLOBAL = 16
CHUNK = 8  # env-state construction granularity (must divide every shard)


def reset_chunked(cfg, n_local, seed0):
    """Process-count-invariant construction: fixed 8-env chunks keyed by
    their global offset, concatenated locally.  fastb (batch-LAST)
    layout: state leaves concatenate on the trailing env axis, the key
    leaf on axis 0."""
    from marl_sortingenv_tpu.core import fastb as FB

    chunks = [FB.reset_batch(cfg, jax.random.PRNGKey(s0), CHUNK)
              for s0 in range(seed0, seed0 + n_local, CHUNK)]
    if len(chunks) == 1:
        return chunks[0]
    kw = {}
    for i, name in enumerate(FB.BState._fields):
        xs = [c[i] for c in chunks]
        if xs[0] is None:
            kw[name] = None
        elif name == "key":
            kw[name] = jnp.concatenate(xs, axis=0)
        else:
            kw[name] = jnp.concatenate(xs, axis=-1)
    return FB.BState(**kw)


def main():
    coordinator, num_procs, pid, outfile = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from marl_sortingenv_tpu.parallel import distributed as DD

    if num_procs > 1:
        DD.initialize(coordinator, num_procs, pid)
        assert jax.process_count() == num_procs, jax.process_count()
        assert jax.local_device_count() == 8 // num_procs
    else:
        DD.initialize()  # single-process: must be a harmless no-op
    assert jax.device_count() == 8, jax.device_count()

    from marl_sortingenv_tpu.config.config import load_config
    from marl_sortingenv_tpu.learn import ppo
    from marl_sortingenv_tpu.parallel import mesh as M

    # the PRODUCTION configuration: batch-last fastb engine, event-bale
    # mode, env step under shard_map (VERDICT r3 next-round #2)
    cfg = load_config(max_steps=8, bale_mode="events")
    pcfg = ppo.PPOConfig(n_steps=4, batch_size=16, n_epochs=2)
    spec = ppo.spec_for("mono", engine="fastb")

    mesh = DD.global_mesh(tp=1)
    env_sh = M.env_sharding(mesh)
    rep = M.replicated(mesh)

    # global dp-sharded env state: each process builds only its env
    # columns (trailing-axis shardings per parallel.fastb_shard)
    env_state = DD.make_global_bstate(
        cfg, reset_chunked, N_ENVS_GLOBAL, mesh)

    # replicated learner state: identical host values on every process,
    # globalized leaf-by-leaf
    ts_host = ppo.init_train_state(cfg, pcfg, spec, n_envs=1, seed=42)

    def rep_global(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(rep, x, x.shape)

    def dp_global(x):
        x = np.asarray(x)
        n_local = N_ENVS_GLOBAL // jax.process_count()
        return jax.make_array_from_process_local_data(
            env_sh, x, (N_ENVS_GLOBAL,) + x.shape[1:])

    with mesh:
        obs = jax.jit(
            spec.batched_obs(cfg),
            out_shardings=env_sh)(env_state)
    zeros_local = np.zeros(
        N_ENVS_GLOBAL // jax.process_count(), np.float32)
    ts = ppo.TrainState(
        params=jax.tree.map(rep_global, ts_host.params),
        opt_state=jax.tree.map(rep_global, ts_host.opt_state),
        env_state=env_state,
        obs=obs,
        key=rep_global(ts_host.key),
        ep_return_acc=dp_global(zeros_local),
        last_ep_return=dp_global(zeros_local),
        update_count=rep_global(ts_host.update_count),
    )

    it = ppo.make_train_iteration(cfg, pcfg, spec, mesh=mesh)
    with mesh:
        ts2, stats = it(ts)
        jax.block_until_ready(stats["loss"])

    # replicated outputs: every process holds the full value locally
    def fetch(x):
        return np.asarray(x.addressable_shards[0].data)

    leaves, _ = jax.tree.flatten(ts2.params)
    out = {f"param_{i}": fetch(x) for i, x in enumerate(leaves)}
    out["loss"] = fetch(stats["loss"])
    out["mean_episode_return"] = fetch(stats["mean_episode_return"])
    np.savez(outfile, **out)
    print(f"worker {pid}/{num_procs} OK loss={out['loss']}")


if __name__ == "__main__":
    main()
