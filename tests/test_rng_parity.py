"""Bit-exact parity of marl_sortingenv_tpu.core.rng against NumPy.

Every RNG primitive the reference consumes (SURVEY.md §2.1 consumption
contract) is checked against the real ``np.random.Generator`` for many
seeds, including interleavings that exercise the buffered-uint32 state.

All device-side sequences are drawn inside a single jitted ``lax.scan``
per primitive so the suite stays fast.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from marl_sortingenv_tpu.core import rng as R

SEEDS = [0, 1, 2, 3, 42, 43, 99, 100, 12345, 2**31, 987654321]


def make_seq(draw_fn, n):
    """Build a jitted fn drawing n values under one scan (compile once)."""

    def body(s, _):
        v, s = draw_fn(s)
        return s, v

    run = jax.jit(lambda s: lax.scan(body, s, None, length=n))

    def seq(s):
        s, vals = run(s)
        return np.asarray(vals), s

    return seq


def test_next_uint64_matches_random_raw():
    seq = make_seq(R.next_uint64, 64)
    for seed in SEEDS:
        expected = np.random.PCG64(seed).random_raw(64)
        got, _ = seq(R.pcg64_init(seed))
        np.testing.assert_array_equal(got.astype(np.uint64), expected)


def test_integers_lemire():
    seq = make_seq(lambda s: R.integers(s, 60, 81), 100)
    for seed in SEEDS:
        g = np.random.default_rng(seed)
        expected = [int(g.integers(60, 81)) for _ in range(100)]
        got, _ = seq(R.pcg64_init(seed))
        assert got.tolist() == expected


def test_integers_various_ranges():
    for lo, hi in [(0, 2), (0, 4), (0, 11), (0, 22), (0, 100), (5, 7), (0, 10**12)]:
        seq = make_seq(lambda s: R.integers(s, lo, hi), 20)
        for seed in SEEDS[:5]:
            g = np.random.default_rng(seed)
            expected = [int(g.integers(lo, hi)) for _ in range(20)]
            got, _ = seq(R.pcg64_init(seed))
            assert got.tolist() == expected, (seed, lo, hi)


def test_random_double_and_uniform():
    seq = make_seq(lambda s: R.uniform(s, -0.05, 0.05), 8)
    for seed in SEEDS:
        g = np.random.default_rng(seed)
        expected = g.uniform(-0.05, 0.05, 8)
        got, _ = seq(R.pcg64_init(seed))
        np.testing.assert_array_equal(got, expected)


def test_uniform_zero_width_still_consumes():
    # noise_sorting=0.0 draws uniform(-0.0, 0.0, 4); stream must advance.
    seed = 7
    g = np.random.default_rng(seed)
    g.uniform(0.0, 0.0, 4)
    expected_after = int(g.integers(0, 100))
    _, s = make_seq(lambda s: R.uniform(s, 0.0, 0.0), 4)(R.pcg64_init(seed))
    got_after, _ = R.integers(s, 0, 100)
    assert int(got_after) == expected_after


def test_shuffle_consumption():
    # Generator.shuffle(list) consumes random_interval(i) for i=n-1..1 on the
    # buffered uint32 stream; later draws must line up exactly.
    shuf = jax.jit(R.shuffle_consume, static_argnums=1)
    seq = make_seq(lambda s: R.integers(s, 0, 1000), 5)
    dbl = jax.jit(R.next_double)
    for n in [100, 10, 2]:
        for seed in SEEDS:
            g = np.random.default_rng(seed)
            lst = list(range(n))
            g.shuffle(lst)
            expected = [int(g.integers(0, 1000)) for _ in range(5)]
            expected_d = g.random()

            s = shuf(R.pcg64_init(seed), n)
            got, s = seq(s)
            got_d, s = dbl(s)
            assert got.tolist() == expected, (seed, n)
            assert float(got_d) == expected_d


def test_shuffle_interval_values_match_fisher_yates():
    # Reconstruct the permutation from our interval draws and compare with
    # numpy's actual shuffle result.
    n = 100

    def body(s, i):
        j, s = R.random_interval32(s, i.astype(jnp.uint32))
        return s, j

    idx = jnp.arange(n - 1, 0, -1)
    run = jax.jit(lambda s: lax.scan(body, s, idx))
    for seed in SEEDS[:6]:
        g = np.random.default_rng(seed)
        lst = list(range(n))
        g.shuffle(lst)

        s, js = run(R.pcg64_init(seed))
        ours = list(range(n))
        for i, j in zip(range(n - 1, 0, -1), np.asarray(js)):
            j = int(j)
            ours[i], ours[j] = ours[j], ours[i]
        assert ours == lst, seed


def test_permutation_two_elements():
    interval = jax.jit(R.random_interval32)
    bounded = jax.jit(lambda s: R.integers(s, 0, 10**6))
    for seed in SEEDS:
        g = np.random.default_rng(seed)
        perm = g.permutation([1, 2])
        after = int(g.integers(0, 10**6))

        s = R.pcg64_init(seed)
        j, s = interval(s, jnp.uint32(1))  # fisher-yates i=1
        ours = [1, 2]
        ours[1], ours[int(j)] = ours[int(j)], ours[1]
        got_after, s = bounded(s)
        assert ours == list(perm), seed
        assert int(got_after) == after


def test_choice_p():
    # Weighted choice with an evolving probability vector, as in the
    # redistribution loop (reference env_super.py:553-567).
    f = jax.jit(R.choice_p)
    for seed in SEEDS:
        g = np.random.default_rng(seed)
        s = R.pcg64_init(seed)
        avail = np.array([3, 0, 5, 2], np.int64)
        for t in range(50):
            p = avail / avail.sum()
            expected = int(g.choice(4, p=p))
            got, s = f(s, jnp.asarray(p))
            assert int(got) == expected, (seed, t)
            avail[expected] = max(avail[expected] - 1, 0)
            if avail.sum() == 0:
                avail = np.array([3, 0, 5, 2], np.int64)


def test_choice_uniform_over_array():
    # rng_pressing.choice(valid): integers(0, len(valid)) then index.
    seq = make_seq(lambda s: R.choice_n(s, 5), 30)
    for seed in SEEDS:
        g = np.random.default_rng(seed)
        valid = np.array([0, 3, 4, 7, 10])
        expected = [int(g.choice(valid)) for _ in range(30)]
        got_idx, _ = seq(R.pcg64_init(seed))
        assert valid[got_idx].tolist() == expected


@jax.jit
def _interleave_chain(s):
    s = R.shuffle_consume(s, 3)
    got_mid, s = R.integers(s, 0, 10**9)
    s = R.shuffle_consume(s, 3)
    got_tail, s = R.next_double(s)
    return got_mid, got_tail


def test_interleaved_32_and_64_buffer_semantics():
    # A 64-bit draw between two 32-bit draws must not clear the 32-bit cache.
    for seed in SEEDS:
        g = np.random.default_rng(seed)
        lst = list(range(3))
        g.shuffle(lst)  # consumes 32-bit draws, likely leaves a cached half
        mid = int(g.integers(0, 10**9))  # 64-bit draw
        lst2 = list(range(3))
        g.shuffle(lst2)  # must reuse the cached half first
        tail = g.random()

        got_mid, got_tail = _interleave_chain(R.pcg64_init(seed))
        assert int(got_mid) == mid
        assert float(got_tail) == tail


def test_vmapped_streams_match_scalar():
    seeds = np.array([1, 2, 3, 4, 5, 6, 7, 8])
    s = R.pcg64_init(seeds)

    def draw_chain(s):
        a, s = R.integers(s, 60, 81)
        b, s = R.next_double(s)
        c, s = R.random_interval32(s, jnp.uint32(99))
        d, s = R.integers(s, 0, 4)
        return (
            jnp.stack(
                [
                    a.astype(jnp.float64),
                    b,
                    c.astype(jnp.float64),
                    d.astype(jnp.float64),
                ]
            ),
            s,
        )

    batched, _ = jax.jit(jax.vmap(draw_chain))(s)
    single_fn = jax.jit(draw_chain)
    for k, seed in enumerate(seeds):
        single, _ = single_fn(R.pcg64_init(seed))
        np.testing.assert_array_equal(np.array(batched[k]), np.array(single))
