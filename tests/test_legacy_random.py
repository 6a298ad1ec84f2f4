"""Legacy MT19937 stream + monolith mode='random' parity (the 5-policy
benchmark's Random scenario)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import legacy_random as LR
from marl_sortingenv_tpu.core import state as S, step as ST

import reference_oracle as oracle

CFG = load_config(max_steps=200, noise_sorting=0.0, balesize=200)


def test_mt19937_raw_stream():
    for seed in [0, 1, 42, 99, 12345]:
        rs = np.random.RandomState(seed)
        expected = rs.randint(0, 2**32, 700, dtype=np.uint64)  # consumes 1 u32 each?
        # randint consumes via bounded masked draws; use tomaxint-free path:
        rs = np.random.RandomState(seed)
        expected = np.array([rs.tomaxint() for _ in range(0)])
        # direct: compare against random_raw
        raw = np.random.MT19937(seed)
        # align seeding: RandomState(seed) and MT19937(seed) differ in
        # seeding; we only need RandomState-compatible state, which
        # mt19937_init copies from RandomState itself.
        s = LR.mt19937_init(seed)

        def body(s, _):
            v, s = LR.next_uint32(s)
            return s, v

        s, got = jax.jit(lambda s: lax.scan(body, s, None, length=700))(s)
        # reference draws via bit_generator of a RandomState
        rs = np.random.RandomState(seed)
        exp = rs._bit_generator.random_raw(700) & 0xFFFFFFFF
        np.testing.assert_array_equal(np.asarray(got), exp.astype(np.uint32))


def test_legacy_randint():
    for seed in [0, 7, 42]:
        for n in [22, 11, 5, 2]:
            np.random.seed(seed)
            expected = [int(np.random.randint(0, n)) for _ in range(50)]
            s = LR.mt19937_init(seed)
            f = jax.jit(lambda s: LR.legacy_randint(s, n))
            got = []
            for _ in range(50):
                v, s = f(s)
                got.append(int(v))
            assert got == expected, (seed, n)


def test_legacy_choice_matches():
    np.random.seed(3)
    valid = np.array([0, 4, 7, 9, 15, 21])
    expected = [int(np.random.choice(valid)) for _ in range(40)]
    s = LR.mt19937_init(3)
    got = []
    for _ in range(40):
        k, s = LR.legacy_randint(s, len(valid))
        got.append(int(valid[int(k)]))
    assert got == expected


def test_mono_random_masked_parity():
    seed, steps = 42, 200
    _, records = oracle.run_episode("mono", seed, steps, mode="random",
                                    use_action_masking=True)
    st = S.reset(CFG, seed)
    lr = LR.mt19937_init(seed)

    def body(carry, _):
        st, lr = carry
        st, lr, out = ST.step_mono_legacy_random(CFG, st, lr, True)
        return (st, lr), out

    (st_f, lr), outs = jax.jit(
        lambda c: lax.scan(body, c, None, length=steps))((st, lr))
    np.testing.assert_array_equal(
        np.asarray(outs.action), np.array([r["action"] for r in records]))
    np.testing.assert_array_equal(
        np.asarray(outs.obs), np.stack([r["obs"] for r in records]))
    np.testing.assert_allclose(
        np.asarray(outs.reward), np.array([r["reward"] for r in records]),
        rtol=0, atol=0)


def test_mono_random_unmasked_parity():
    seed, steps = 7, 200
    _, records = oracle.run_episode("mono", seed, steps, mode="random",
                                    use_action_masking=False)
    st = S.reset(CFG, seed)
    lr = LR.mt19937_init(seed)

    def body(carry, _):
        st, lr = carry
        st, lr, out = ST.step_mono_legacy_random(CFG, st, lr, False)
        return (st, lr), out

    (st_f, lr), outs = jax.jit(
        lambda c: lax.scan(body, c, None, length=steps))((st, lr))
    np.testing.assert_array_equal(
        np.asarray(outs.action), np.array([r["action"] for r in records]))
    np.testing.assert_array_equal(
        np.asarray(outs.obs), np.stack([r["obs"] for r in records]))
