"""Bitwise prototype of the jax.random threefry2x32 calls used by
core.fastb's RNG helpers (_vsplit / _vuniform), as plain jnp ops over
batch-last (2, N) key arrays.

Goal: establish the exact bit-level recipe a fused Pallas sort kernel
must implement so its trajectories stay bit-identical to the XLA path
(core.fastb._sort_material).  Asserts bitwise equality against
jax.random on random keys.
"""
import sys

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

ROT_EVEN = (13, 15, 26, 6)
ROT_ODD = (17, 29, 16, 24)


def _rotl(x, r):
    return (x << U32(r)) | (x >> U32(32 - r))


def threefry2x32(k0, k1, c0, c1):
    """One threefry-2x32 block over vectors: keys (k0,k1), counters
    (c0,c1) -> two output words.  Mirrors jax._src.prng.threefry2x32."""
    ks = (k0, k1, k0 ^ k1 ^ U32(0x1BD11BDA))
    x0 = c0 + ks[0]
    x1 = c1 + ks[1]
    rots = (ROT_EVEN, ROT_ODD, ROT_EVEN, ROT_ODD, ROT_EVEN)
    for grp in range(5):
        for r in rots[grp]:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x0 ^ x1
        # key injection after each 4-round group (i = grp+1):
        # x0 += ks[i % 3]; x1 += ks[(i+1) % 3] + i
        i = grp + 1
        x0 = x0 + ks[i % 3]
        x1 = x1 + ks[(i + 1) % 3] + U32(i)
    return x0, x1


def split2(k0, k1):
    """jax.random.split(key, 2) on batched raw keys (k0,k1): u32[N].

    Partitionable threefry (jax default, ``_threefry_split_foldlike``):
    output key i = threefry2x32(key, counter=(hi=0, lo=i))."""
    z = jnp.zeros_like(k0)
    a0, a1 = threefry2x32(k0, k1, z, z)
    b0, b1 = threefry2x32(k0, k1, z, z + 1)
    return (a0, a1), (b0, b1)


def split3(k0, k1):
    """jax.random.split(key, 3): key i = block with counter (0, i)."""
    z = jnp.zeros_like(k0)
    a = threefry2x32(k0, k1, z, z)
    b = threefry2x32(k0, k1, z, z + 1)
    c = threefry2x32(k0, k1, z, z + 2)
    return a, b, c


def uniform01(k0, k1):
    """jax.random.uniform(key, ()) f32 in [0,1).

    Partitionable ``random_bits(key, 32, ())``: one block with counter
    (0, 0), 32-bit word = o0 ^ o1.  Conversion (jax.random.uniform):
    (bits >> 9) | 0x3f800000 bitcast f32, minus 1."""
    z = jnp.zeros_like(k0)
    w0, w1 = threefry2x32(k0, k1, z, z)
    bits = w0 ^ w1
    f = jax.lax.bitcast_convert_type((bits >> U32(9)) | U32(0x3F800000),
                                     jnp.float32)
    return f - jnp.float32(1.0)


def main():
    rng = np.random.RandomState(0)
    keys = rng.randint(0, 2**32, size=(257, 2), dtype=np.uint64).astype(
        np.uint32)
    k0 = jnp.asarray(keys[:, 0])
    k1 = jnp.asarray(keys[:, 1])

    # --- split2 vs jax.random.split ---
    ref = jax.vmap(lambda k: jax.random.split(k, 2))(jnp.asarray(keys))
    ka, kb = split2(k0, k1)
    mine = jnp.stack([jnp.stack(ka, -1), jnp.stack(kb, -1)], 1)
    assert (ref == mine).all(), "split2 mismatch"

    # --- split3 ---
    ref3 = jax.vmap(lambda k: jax.random.split(k, 3))(jnp.asarray(keys))
    ks3 = split3(k0, k1)
    mine3 = jnp.stack([jnp.stack(p, -1) for p in ks3], 1)
    assert (ref3 == mine3).all(), "split3 mismatch"

    # --- uniform ---
    refu = jax.vmap(lambda k: jax.random.uniform(k, dtype=jnp.float32))(
        jnp.asarray(keys))
    u = uniform01(k0, k1)
    assert (refu.view(jnp.uint32) == u.view(jnp.uint32)).all(), \
        f"uniform mismatch: {refu[:4]} vs {u[:4]}"

    print("threefry proto: split2/split3/uniform all bitwise-equal to "
          "jax.random over", keys.shape[0], "keys")


if __name__ == "__main__":
    main()
