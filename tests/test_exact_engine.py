"""Exact-mode engine (TPU-safe integer soft-float) vs the parity engine:
bit-for-bit agreement on CPU over full rule-based episodes."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import exact_dynamics as XD
from marl_sortingenv_tpu.core import state as S, step as ST

CFG = load_config(max_steps=200, noise_sorting=0.0, balesize=200)


def run_parity(seed, steps):
    st = S.reset(CFG, seed)

    def body(st, _):
        st, out = ST.step_mono_rule(CFG, st)
        return st, (out.obs, out.action, out.purity)

    return jax.jit(lambda st: lax.scan(body, st, None, length=steps))(st)


def run_exact(seed, steps):
    st = S.reset(CFG, seed)

    def body(st, _):
        st, out = XD.step_mono_rule_exact(CFG, st)
        return st, (out["obs"], out["action"], out["purity_cents"])

    return jax.jit(lambda st: lax.scan(body, st, None, length=steps))(st)


def test_exact_engine_matches_parity_engine_bitwise():
    for seed in (42, 7, 123):
        steps = 150
        stp, (obs_p, act_p, pur_p) = run_parity(seed, steps)
        stx, (obs_x, act_x, pur_x) = run_exact(seed, steps)

        np.testing.assert_array_equal(np.asarray(act_x), np.asarray(act_p),
                                      err_msg=f"seed {seed}")
        # obs must agree bit-for-bit (f32)
        np.testing.assert_array_equal(
            np.asarray(obs_x).view(np.uint32),
            np.asarray(obs_p).view(np.uint32), err_msg=f"seed {seed}")
        # purity: parity engine reports f64 two-decimal; exact reports cents
        np.testing.assert_array_equal(
            np.asarray(pur_x),
            np.rint(np.asarray(pur_p) * 100).astype(np.int32))
        # state: integer fields identical
        for f in ("cont_true", "cont_false", "press_timer", "press_n",
                  "bale_cnt"):
            np.testing.assert_array_equal(
                np.asarray(getattr(stx, f)), np.asarray(getattr(stp, f)),
                err_msg=f"{f} seed {seed}")
        cnts = np.asarray(stx.bale_cnt)
        for row in range(5):
            n = int(cnts[row])
            np.testing.assert_array_equal(
                np.asarray(stx.bale_size)[row][:n],
                np.asarray(stp.bale_size)[row][:n])
            np.testing.assert_array_equal(
                np.asarray(stx.bale_qual)[row][:n],
                np.asarray(stp.bale_qual)[row][:n])
        # press_q: cents vs fraction
        np.testing.assert_array_equal(
            np.asarray(stx.press_q),
            np.rint(np.asarray(stp.press_q) * 100))
        # RNG streams advanced identically
        np.testing.assert_array_equal(
            np.asarray(stx.rng.state_lo), np.asarray(stp.rng.state_lo))
        np.testing.assert_array_equal(
            np.asarray(stx.rng_noise.state_lo),
            np.asarray(stp.rng_noise.state_lo))

def test_exact_engine_rewards_bitwise_and_cumulative():
    """Exact-engine rewards (pure integer/soft-float, no device f64) must
    equal the parity engine's f64 rewards bit-for-bit, and the on-device
    cumulative return must equal the reference's left-to-right Python sum
    (testing.py:78-85)."""
    for seed in (42, 7):
        steps = 150
        st = S.reset(CFG, seed)

        def body(st, _):
            st, out = ST.step_mono_rule(CFG, st)
            return st, (out.reward, out.sort_reward, out.press_reward)

        _, (rew_p, sr_p, pr_p) = jax.jit(
            lambda st: lax.scan(body, st, None, length=steps))(st)

        stx = S.reset(CFG, seed)
        _, outs, cum_bits = XD.rollout_rule_exact(CFG, stx, steps)

        np.testing.assert_array_equal(
            np.asarray(outs["reward_bits"]),
            np.asarray(rew_p, np.float64).view(np.uint64),
            err_msg=f"total reward seed {seed}")
        np.testing.assert_array_equal(
            np.asarray(outs["sort_reward_bits"]),
            np.asarray(sr_p, np.float64).view(np.uint64))
        np.testing.assert_array_equal(
            np.asarray(outs["press_reward_bits"]),
            np.asarray(pr_p, np.float64).view(np.uint64))

        # cumulative: reference sums per-step floats left to right
        acc = 0.0
        for r in np.asarray(rew_p, np.float64):
            acc = acc + float(r)
        assert np.uint64(int(cum_bits)) == np.float64(acc).view(np.uint64)

def _scan(step, st, actions):
    def body(st, a):
        st, out = step(st, a)
        return st, out
    return jax.jit(lambda st, acts: lax.scan(body, st, acts))(
        st, jnp.asarray(actions, jnp.int32))


def _assert_match(outs_x, outs_p, check_sort_press=False):
    np.testing.assert_array_equal(
        np.asarray(outs_x["obs"]).view(np.uint32),
        np.asarray(outs_p.obs).view(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(outs_x["reward_bits"]),
        np.asarray(outs_p.reward, np.float64).view(np.uint64))
    np.testing.assert_array_equal(
        np.asarray(outs_x["press_log"]), np.asarray(outs_p.press_log))
    if check_sort_press:
        np.testing.assert_array_equal(
            np.asarray(outs_x["sort_reward_bits"]),
            np.asarray(outs_p.sort_reward, np.float64).view(np.uint64))
        np.testing.assert_array_equal(
            np.asarray(outs_x["press_reward_bits"]),
            np.asarray(outs_p.press_reward, np.float64).view(np.uint64))


def test_exact_step_sort_matches_parity():
    seed, steps = 42, 120
    rng = np.random.default_rng(5)
    actions = rng.integers(0, 2, steps)
    st = S.reset(CFG, seed)
    _, outs_p = _scan(lambda s, a: ST.step_sort(CFG, s, a), st, actions)
    st = S.reset(CFG, seed)
    _, outs_x = _scan(lambda s, a: XD.step_sort_exact(CFG, s, a), st, actions)
    _assert_match(outs_x, outs_p)


def test_exact_step_press_matches_parity_masked_and_unmasked():
    seed, steps = 42, 120
    rng = np.random.default_rng(6)
    actions = rng.integers(0, 11, steps)  # includes invalid ones
    for masking in (True, False):
        st = S.reset(CFG, seed)
        _, outs_p = _scan(
            lambda s, a: ST.step_press(CFG, s, a, None, masking), st,
            actions if not masking else np.zeros(steps, np.int64))
        st = S.reset(CFG, seed)
        _, outs_x = _scan(
            lambda s, a: XD.step_press_exact(CFG, s, a, masking), st,
            actions if not masking else np.zeros(steps, np.int64))
        _assert_match(outs_x, outs_p)


def test_exact_step_mono_external_matches_parity():
    seed, steps = 42, 120
    rng = np.random.default_rng(7)
    actions = rng.integers(0, 22, steps)
    for masking in (True, False):
        acts = np.zeros(steps, np.int64) if masking else actions
        st = S.reset(CFG, seed)
        _, outs_p = _scan(
            lambda s, a: ST.step_mono_external(CFG, s, a, masking), st, acts)
        st = S.reset(CFG, seed)
        _, outs_x = _scan(
            lambda s, a: XD.step_mono_external_exact(CFG, s, a, masking),
            st, acts)
        _assert_match(outs_x, outs_p, check_sort_press=True)


# ---------------------------------------------------------------------------
# noise > 0: the reference DEFAULT config (config.yml noise=0.05).  The
# accuracy pipeline runs in the integer soft-float kernel (uniform draw,
# mul/add roundings, clip) with exact f64 accuracies carried as IEEE bits
# in acc_belt_bits/acc_sorter_bits — VERDICT r1 "Missing #4".
# ---------------------------------------------------------------------------

CFG_N = load_config(max_steps=200, noise_sorting=0.05, balesize=200)


def test_exact_engine_noise_rule_matches_parity_bitwise():
    steps = 150
    for seed in (42, 7):
        st = S.reset(CFG_N, seed)

        def bodyp(st, _):
            st, out = ST.step_mono_rule(CFG_N, st)
            return st, (out.obs, out.action, out.reward, st.acc_belt)

        stp, (obs_p, act_p, rew_p, acc_p) = jax.jit(
            lambda st: lax.scan(bodyp, st, None, length=steps))(st)

        st = S.reset(CFG_N, seed)

        def bodyx(st, _):
            st, out = XD.step_mono_rule_exact(CFG_N, st)
            return st, (out["obs"], out["action"], out["reward_bits"],
                        st.acc_belt_bits)

        stx, (obs_x, act_x, rew_x, acc_x) = jax.jit(
            lambda st: lax.scan(bodyx, st, None, length=steps))(st)

        # the exact engine's accuracy BITS equal the parity engine's f64
        # accuracies bit-for-bit (CPU f64 is IEEE)
        np.testing.assert_array_equal(
            np.asarray(acc_x),
            np.asarray(acc_p, np.float64).view(np.uint64),
            err_msg=f"acc seed {seed}")
        np.testing.assert_array_equal(np.asarray(act_x), np.asarray(act_p))
        np.testing.assert_array_equal(
            np.asarray(obs_x).view(np.uint32),
            np.asarray(obs_p).view(np.uint32), err_msg=f"obs seed {seed}")
        np.testing.assert_array_equal(
            np.asarray(rew_x),
            np.asarray(rew_p, np.float64).view(np.uint64),
            err_msg=f"reward seed {seed}")
        # streams advanced identically (same per-step draw counts)
        np.testing.assert_array_equal(
            np.asarray(stx.rng.state_lo), np.asarray(stp.rng.state_lo))
        np.testing.assert_array_equal(
            np.asarray(stx.rng_noise.state_lo),
            np.asarray(stp.rng_noise.state_lo))
        for f in ("cont_true", "cont_false", "press_timer", "press_n",
                  "bale_cnt"):
            np.testing.assert_array_equal(
                np.asarray(getattr(stx, f)), np.asarray(getattr(stp, f)),
                err_msg=f"{f} seed {seed}")


def test_exact_noise_external_and_sort_paths_match_parity():
    seed, steps = 42, 120
    rng = np.random.default_rng(8)
    mono_acts = rng.integers(0, 22, steps)
    st = S.reset(CFG_N, seed)
    _, outs_p = _scan(
        lambda s, a: ST.step_mono_external(CFG_N, s, a, False), st, mono_acts)
    st = S.reset(CFG_N, seed)
    _, outs_x = _scan(
        lambda s, a: XD.step_mono_external_exact(CFG_N, s, a, False),
        st, mono_acts)
    _assert_match(outs_x, outs_p, check_sort_press=True)

    sort_acts = rng.integers(0, 2, steps)
    st = S.reset(CFG_N, seed)
    _, outs_p = _scan(lambda s, a: ST.step_sort(CFG_N, s, a), st, sort_acts)
    st = S.reset(CFG_N, seed)
    _, outs_x = _scan(
        lambda s, a: XD.step_sort_exact(CFG_N, s, a), st, sort_acts)
    _assert_match(outs_x, outs_p)


@pytest.mark.parametrize("noisy", [False, True])
@pytest.mark.parametrize("masking", [False, True])
def test_exact_mono_random_matches_parity(noisy, masking):
    """Exact legacy-random monolith path (MT19937) == parity engine,
    masked and unmasked, at noise 0 and the default noise 0.05.
    (Parametrized so xdist can spread the 8 heavy x64 compiles that a
    single combined test serialized on one worker.)"""
    from marl_sortingenv_tpu.core import legacy_random as LR

    seed, steps = 42, 100
    for cfg in ((CFG_N,) if noisy else (CFG,)):
        for masking in (masking,):
            st = S.reset(cfg, seed)
            lr = LR.mt19937_init(seed)

            def bodyp(c, _):
                st, lr = c
                st, lr, out = ST.step_mono_legacy_random(cfg, st, lr, masking)
                return (st, lr), (out.obs, out.action, out.reward,
                                  out.press_log)

            (stp, _), (obs_p, act_p, rew_p, log_p) = jax.jit(
                lambda c: lax.scan(bodyp, c, None, length=steps))((st, lr))

            st = S.reset(cfg, seed)
            lr = LR.mt19937_init(seed)

            def bodyx(c, _):
                st, lr = c
                st, lr, out = XD.step_mono_random_exact(cfg, st, lr, masking)
                return (st, lr), (out["obs"], out["action"],
                                  out["reward_bits"], out["press_log"])

            (stx, _), (obs_x, act_x, rew_x, log_x) = jax.jit(
                lambda c: lax.scan(bodyx, c, None, length=steps))((st, lr))

            tag = f"cfg_noise={cfg.effective_noise} masking={masking}"
            np.testing.assert_array_equal(
                np.asarray(act_x), np.asarray(act_p), err_msg=tag)
            np.testing.assert_array_equal(
                np.asarray(obs_x).view(np.uint32),
                np.asarray(obs_p).view(np.uint32), err_msg=tag)
            np.testing.assert_array_equal(
                np.asarray(rew_x),
                np.asarray(rew_p, np.float64).view(np.uint64), err_msg=tag)
            np.testing.assert_array_equal(
                np.asarray(log_x), np.asarray(log_p), err_msg=tag)
