"""Fused Pallas sort kernel (ops/sort_pallas.py): bitwise equivalence
with the XLA path, flag plumbing, and threefry recipe validation.

The kernel's TPU lowering + timing evidence lives in
``artifacts/sort_pallas_ab.py`` (bitwise PASS + 1.5x core speedup on the
real chip); here we pin the semantics on CPU via interpret mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fastb as FB
from marl_sortingenv_tpu.ops import sort_pallas as SP


def _stepped_state(cfg, n, steps=6):
    st = FB.reset_batch(cfg, jax.random.PRNGKey(0), n)
    stepped = FB.with_autoreset(cfg, lambda c, s, a: FB.step_mono_rule(c, s))
    run = jax.jit(stepped)
    for _ in range(steps):
        st, _ = run(st, jnp.zeros(n, jnp.int32))
    return st


def _xla_path(cfg, st):
    """The exact XLA draw chain + redistribution from _sort_material."""
    support = FB._support_for(cfg)
    key = st.key
    us = []
    for _ in range(4):
        ks = FB._vsplit(key)
        key, sk = ks[:, 0], ks[:, 1]
        k3 = FB._vsplit(sk, 3)
        us.extend(FB._vuniform(k3[:, j]) for j in range(3))
    lo, t, f = FB.redistribute_u(st.sort_counts, st.acc_sorter,
                                 jnp.stack(us), support)
    return lo, t, f, key


def test_kernel_bitwise_equals_xla_path():
    cfg = load_config()
    st = _stepped_state(cfg, 256)
    lo_x, t_x, f_x, k_x = _xla_path(cfg, st)
    lo_p, t_p, f_p, k_p = SP.sort_material_fused(
        st.sort_counts, st.acc_sorter, st.key,
        support=FB._support_for(cfg), interpret=True)
    np.testing.assert_array_equal(np.asarray(lo_x), np.asarray(lo_p))
    np.testing.assert_array_equal(np.asarray(t_x), np.asarray(t_p))
    np.testing.assert_array_equal(np.asarray(f_x), np.asarray(f_p))
    np.testing.assert_array_equal(np.asarray(k_x), np.asarray(k_p))


def test_kernel_bitwise_with_noise_accuracy():
    """Noisy accuracies exercise non-trivial rint/true_val splits."""
    cfg = load_config(noise_sorting=0.05)
    st = _stepped_state(cfg, 128)
    lo_x, t_x, f_x, k_x = _xla_path(cfg, st)
    lo_p, t_p, f_p, k_p = SP.sort_material_fused(
        st.sort_counts, st.acc_sorter, st.key,
        support=FB._support_for(cfg), interpret=True)
    np.testing.assert_array_equal(np.asarray(lo_x), np.asarray(lo_p))
    np.testing.assert_array_equal(np.asarray(t_x), np.asarray(t_p))
    np.testing.assert_array_equal(np.asarray(f_x), np.asarray(f_p))
    np.testing.assert_array_equal(np.asarray(k_x), np.asarray(k_p))


def test_flag_resolution():
    cfg = load_config()
    # CPU backend: auto must resolve to the XLA path
    assert not FB._use_sort_kernel(cfg, 4096)
    # forced pallas with a bad batch size raises
    with pytest.raises(ValueError):
        FB._use_sort_kernel(cfg.with_(sort_kernel="pallas"), 100)
    assert FB._use_sort_kernel(cfg.with_(sort_kernel="pallas"), 4096)
    assert not FB._use_sort_kernel(cfg.with_(sort_kernel="xla"), 4096)
    assert not SP.supported(100)
    assert SP.supported(8192)


def test_threefry_matches_jax_random():
    """The kernel's threefry recipe (partitionable split / random_bits /
    uniform) against jax.random, bitwise, over random keys."""
    rng = np.random.RandomState(7)
    keys = rng.randint(0, 2**32, size=(64, 2), dtype=np.uint64).astype(
        np.uint32)
    k0, k1 = jnp.asarray(keys[:, 0]), jnp.asarray(keys[:, 1])
    z = jnp.zeros_like(k0)

    ref2 = jax.vmap(lambda k: jax.random.split(k, 2))(jnp.asarray(keys))
    a = SP._threefry(k0, k1, z, z)
    b = SP._threefry(k0, k1, z, z + 1)
    mine2 = jnp.stack([jnp.stack(a, -1), jnp.stack(b, -1)], 1)
    np.testing.assert_array_equal(np.asarray(ref2), np.asarray(mine2))

    refu = jax.vmap(lambda k: jax.random.uniform(k, dtype=jnp.float32))(
        jnp.asarray(keys))
    u = SP._bits_to_unit_f32(a[0] ^ a[1])
    np.testing.assert_array_equal(
        np.asarray(refu).view(np.uint32), np.asarray(u).view(np.uint32))


def test_kernel_grid_tiling_bitwise(monkeypatch):
    """Batches larger than one tile run as a grid of per-tile programs
    (the >32k-env path); force a tiny tile so 512 envs cover grid=2."""
    monkeypatch.setattr(SP, "_TILE", 2)
    assert SP._tile_for(512 // 128) == 2
    cfg = load_config()
    st = _stepped_state(cfg, 512)
    lo_x, t_x, f_x, k_x = _xla_path(cfg, st)
    lo_p, t_p, f_p, k_p = SP.sort_material_fused(
        st.sort_counts, st.acc_sorter, st.key,
        support=FB._support_for(cfg), interpret=True)
    np.testing.assert_array_equal(np.asarray(lo_x), np.asarray(lo_p))
    np.testing.assert_array_equal(np.asarray(t_x), np.asarray(t_p))
    np.testing.assert_array_equal(np.asarray(f_x), np.asarray(f_p))
    np.testing.assert_array_equal(np.asarray(k_x), np.asarray(k_p))


def test_no_upper_batch_cap():
    """Round-3 capped the kernel at 32768 envs (silent 2.4x fallback
    cliff); the grid removed it."""
    assert SP.supported(65536)
    assert SP.supported(131072)
    assert SP._tile_for(65536 // 128) == SP._TILE


def test_kernel_refused_without_partitionable_threefry():
    """The kernel hardcodes partitionable threefry; with the flag off the
    XLA path draws different bits, so auto must refuse and pallas raise
    (ADVICE r3)."""
    cfg = load_config()
    jax.config.update("jax_threefry_partitionable", False)
    try:
        assert not FB._use_sort_kernel(cfg, 4096)
        with pytest.raises(ValueError, match="partitionable"):
            FB._use_sort_kernel(cfg.with_(sort_kernel="pallas"), 4096)
    finally:
        jax.config.update("jax_threefry_partitionable", True)


def test_pjit_auto_sharded_detection_and_gate():
    """ADVICE r3 #3: a pjit-auto-sharded fastb state (NamedSharding
    under jit WITHOUT shard_map) must not reach the SPMD-opaque kernel —
    auto falls back to XLA, forced pallas raises; under shard_map
    (manual blocks, the production multi-chip path) the kernel stays
    allowed."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("dp", "tp"))
    x = jax.device_put(jnp.zeros((4, 512), jnp.int32),
                       NamedSharding(mesh, P(None, "dp")))

    seen = {}

    @jax.jit
    def probe(x):
        seen["auto"] = SP.pjit_auto_sharded(x)
        return x

    probe(x)
    assert seen["auto"] is True

    def inner(x):
        seen["manual"] = SP.pjit_auto_sharded(x)
        return x

    jax.jit(jax.shard_map(inner, mesh=mesh, in_specs=P(None, "dp"),
                          out_specs=P(None, "dp")))(x)
    assert seen["manual"] is False

    # eager, unsharded single-device array
    assert SP.pjit_auto_sharded(jnp.zeros((4, 128), jnp.int32)) is False

    # the fastb gate: forced pallas + auto-sharded state raises
    cfg = load_config(sort_kernel="pallas")
    st = FB.reset_batch(cfg, jax.random.PRNGKey(0), 512)
    st = st._replace(
        sort_counts=jax.device_put(st.sort_counts,
                                   NamedSharding(mesh, P(None, "dp"))))
    with pytest.raises(ValueError, match="shard_map|pjit-auto"):
        jax.jit(lambda s: FB._sort_material(cfg, s))(st)
