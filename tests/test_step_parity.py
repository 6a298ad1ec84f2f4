"""Golden-trajectory parity: the jitted TPU engine must reproduce the
reference implementation bit-for-bit — state, observations, masks, and
rewards.  Rewards are exact too: the sorting reward's ``np.tanh`` is
resolved through the finite-domain lookup table built by
``core/reward_tables.py`` (the table values ARE NumPy's tanh outputs),
so every comparison here is zero-tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from marl_sortingenv_tpu.config.config import SimConfig, load_config
from marl_sortingenv_tpu.core import state as S
from marl_sortingenv_tpu.core import step as ST
from marl_sortingenv_tpu.core import dynamics as D

import reference_oracle as oracle

CFG = load_config(max_steps=200, noise_sorting=0.0, balesize=200)


def compare_step(t, rec, out, st, cfg, variant, reward_tol):
    snap = rec["snap"]
    ours = {
        "input_counts": np.asarray(st.input_counts),
        "belt_counts": np.asarray(st.belt_counts),
        "sort_counts": np.asarray(st.sort_counts),
        "acc_belt": np.asarray(st.acc_belt),
        "acc_sorter": np.asarray(st.acc_sorter),
        "sensor_setting": np.asarray(st.sensor_setting),
        "input_occupancy": np.asarray(st.input_occupancy),
        "belt_occupancy": np.asarray(st.belt_occupancy),
        "cont_true": np.asarray(st.cont_true),
        "cont_false": np.asarray(st.cont_false),
        "press_timer": np.asarray(st.press_timer),
        "press_n": np.asarray(st.press_n),
        "press_q": np.asarray(st.press_q),
        "current_step": np.asarray(st.current_step),
    }
    for key, mine in ours.items():
        np.testing.assert_array_equal(
            mine, snap[key], err_msg=f"step {t}: {key}"
        )
    # press material only meaningful while a job is loaded
    for p in range(2):
        if snap["press_n"][p] > 0:
            assert int(np.asarray(st.press_mat)[p]) == snap["press_mat"][p], (
                t, p)
    # masks (evaluated on post-step state)
    mask = np.asarray(D.press_action_masks(cfg, st))
    np.testing.assert_array_equal(mask, snap["mask"], err_msg=f"step {t} mask")
    # bales
    for row, mat in enumerate("ABCDE"):
        cnt = int(np.asarray(st.bale_cnt)[row])
        sizes = np.asarray(st.bale_size)[row][:cnt]
        quals = np.asarray(st.bale_qual)[row][:cnt]
        np.testing.assert_array_equal(
            sizes, snap[f"bale_sizes_{mat}"], err_msg=f"step {t} bale sizes {mat}"
        )
        np.testing.assert_array_equal(
            quals, snap[f"bale_quals_{mat}"], err_msg=f"step {t} bale quals {mat}"
        )
    # obs: bit-exact f32
    np.testing.assert_array_equal(
        np.asarray(out.obs), rec["obs"], err_msg=f"step {t} obs"
    )
    # rewards
    assert abs(float(out.reward) - rec["reward"]) <= reward_tol, (
        t, float(out.reward), rec["reward"])
    assert float(out.purity) == rec["purity"], t
    assert bool(out.terminated) == rec["terminated"], t
    assert int(out.action) == int(rec["action"]), t


def run_ours(variant_step, cfg, seed, actions):
    st = S.reset(cfg, seed)

    def body(st, a):
        st, out = variant_step(cfg, st, a)
        return st, out

    step_jit = jax.jit(lambda st, acts: lax.scan(body, st, acts))
    st_f, outs = step_jit(st, jnp.asarray(actions, jnp.int32))
    return st_f, outs


def replay_compare(variant, cfg, seed, actions, records, variant_step,
                   reward_tol=0.0):
    st = S.reset(cfg, seed)
    step_jit = jax.jit(lambda st, a: variant_step(cfg, st, a))
    for t, rec in enumerate(records):
        st, out = step_jit(st, jnp.int32(actions[t]))
        compare_step(t, rec, out, st, cfg, variant, reward_tol)


def test_env1_sort_parity_seed42():
    seed, steps = 42, 120
    rng = np.random.default_rng(777)
    actions = rng.integers(0, 2, steps)
    _, records = oracle.run_episode("sort", seed, steps, actions=actions)
    replay_compare("sort", CFG, seed, actions, records,
                   lambda cfg, st, a: ST.step_sort(cfg, st, a))


def test_env1_sort_parity_more_seeds_scanned():
    # full-episode scan under one jit for several seeds
    steps = 200
    for seed in [1, 7, 99]:
        rng = np.random.default_rng(1000 + seed)
        actions = rng.integers(0, 2, steps)
        _, records = oracle.run_episode("sort", seed, steps, actions=actions)
        st_f, outs = run_ours(
            lambda cfg, st, a: ST.step_sort(cfg, st, a), CFG, seed, actions
        )
        ref_obs = np.stack([r["obs"] for r in records])
        np.testing.assert_array_equal(np.asarray(outs.obs), ref_obs)
        ref_rew = np.array([r["reward"] for r in records])
        np.testing.assert_allclose(np.asarray(outs.reward), ref_rew,
                                   rtol=0, atol=0)
        # final state fingerprints
        snap = records[-1]["snap"]
        np.testing.assert_array_equal(np.asarray(st_f.cont_true), snap["cont_true"])
        np.testing.assert_array_equal(np.asarray(st_f.cont_false), snap["cont_false"])
        np.testing.assert_array_equal(np.asarray(st_f.press_timer), snap["press_timer"])


def test_env3_mono_rule_based_parity():
    seed, steps = 42, 200
    _, records = oracle.run_episode("mono", seed, steps, mode="rule_based")
    st = S.reset(CFG, seed)

    def body(st, _):
        st, out = ST.step_mono_rule(CFG, st)
        return st, out

    st_f, outs = jax.jit(lambda st: lax.scan(body, st, None, length=steps))(st)
    ref_obs = np.stack([r["obs"] for r in records])
    np.testing.assert_array_equal(np.asarray(outs.obs), ref_obs)
    ref_rew = np.array([r["reward"] for r in records])
    np.testing.assert_allclose(np.asarray(outs.reward), ref_rew, rtol=0,
                               atol=0)
    ref_act = np.array([r["action"] for r in records])
    np.testing.assert_array_equal(np.asarray(outs.action), ref_act)
    # press rewards must be bit-exact (no tanh involved)
    ref_press_r = np.stack([r["reward_pair"] for r in records])[:, 1]
    np.testing.assert_array_equal(np.asarray(outs.press_reward), ref_press_r)
    snap = records[-1]["snap"]
    st = st_f
    np.testing.assert_array_equal(np.asarray(st.cont_true), snap["cont_true"])
    np.testing.assert_array_equal(np.asarray(st.cont_false), snap["cont_false"])
    np.testing.assert_array_equal(np.asarray(st.press_q), snap["press_q"])
    for row, mat in enumerate("ABCDE"):
        cnt = int(np.asarray(st.bale_cnt)[row])
        np.testing.assert_array_equal(
            np.asarray(st.bale_size)[row][:cnt], snap[f"bale_sizes_{mat}"])


def test_env3_mono_external_masked_parity():
    # external flat actions chosen valid-per-mask on the reference side
    seed, steps = 5, 150
    env = oracle.make_env("mono", max_steps=200, seed=seed)
    with oracle.reference_cwd():
        env.reset(seed=seed)
    rng = np.random.default_rng(123)
    actions = []
    records = []
    with oracle.reference_cwd():
        for t in range(steps):
            mask = env.monolith_action_masks()
            valid = np.flatnonzero(mask)
            a = int(rng.choice(valid))
            actions.append(a)
            obs, r, done, _, info = env.step(action=a, use_action_masking=True)
            records.append({
                "obs": np.asarray(obs, np.float32),
                "reward": np.float64(r),
                "terminated": bool(done),
                "action": np.int64(info["action"]),
                "reward_pair": np.array(env.reward_data["Reward"][-1], np.float64),
                "purity": np.float64(env.reward_data["Accuracy"][-1]),
                "snap": oracle.snapshot(env),
            })

    st = S.reset(CFG, seed)

    def body(st, a):
        st, out = ST.step_mono_external(CFG, st, a, True)
        return st, out

    st_f, outs = jax.jit(lambda st, acts: lax.scan(body, st, acts))(
        st, jnp.asarray(actions, jnp.int32))
    ref_obs = np.stack([r["obs"] for r in records])
    np.testing.assert_array_equal(np.asarray(outs.obs), ref_obs)
    ref_rew = np.array([r["reward"] for r in records])
    np.testing.assert_allclose(np.asarray(outs.reward), ref_rew, rtol=0,
                               atol=0)


def test_env3_mono_external_unmasked_sanitize_parity():
    # raw random flat actions (many invalid) with masking off: sanitize path
    seed, steps = 11, 150
    rng = np.random.default_rng(321)
    actions = rng.integers(0, 22, steps)
    _, records = oracle.run_episode("mono", seed, steps, actions=actions,
                                    use_action_masking=False)
    st = S.reset(CFG, seed)

    def body(st, a):
        st, out = ST.step_mono_external(CFG, st, a, False)
        return st, out

    st_f, outs = jax.jit(lambda st, acts: lax.scan(body, st, acts))(
        st, jnp.asarray(actions, jnp.int32))
    ref_obs = np.stack([r["obs"] for r in records])
    np.testing.assert_array_equal(np.asarray(outs.obs), ref_obs)
    ref_rew = np.array([r["reward"] for r in records])
    np.testing.assert_allclose(np.asarray(outs.reward), ref_rew, rtol=0,
                               atol=0)
    snap = records[-1]["snap"]
    np.testing.assert_array_equal(np.asarray(st_f.cont_true), snap["cont_true"])


def test_env2_press_rule_sort_parity():
    # pressing env with rule-based sort side (no frozen agent), masked
    # actions chosen valid on the reference side
    seed, steps = 3, 150
    env = oracle.make_env("press", max_steps=200, seed=seed)
    with oracle.reference_cwd():
        env.reset(seed=seed)
    rng = np.random.default_rng(55)
    actions, records = [], []
    with oracle.reference_cwd():
        for t in range(steps):
            mask = env.press_action_masks()
            valid = np.flatnonzero(mask)
            a = int(rng.choice(valid))
            actions.append(a)
            obs, r, done, _, info = env.step(a, use_action_masking=True)
            records.append({
                "obs": np.asarray(obs, np.float32),
                "reward": np.float64(r),
                "terminated": bool(done),
                "action": np.int64(info["action"]),
                "purity": np.float64(env.reward_data["Accuracy"][-1]),
                "reward_pair": np.array(env.reward_data["Reward"][-1], np.float64),
                "snap": oracle.snapshot(env),
            })
    st = S.reset(CFG, seed)

    def body(st, a):
        st, out = ST.step_press(CFG, st, a, None, True)
        return st, out

    st_f, outs = jax.jit(lambda st, acts: lax.scan(body, st, acts))(
        st, jnp.asarray(actions, jnp.int32))
    ref_obs = np.stack([r["obs"] for r in records])
    np.testing.assert_array_equal(np.asarray(outs.obs), ref_obs)
    # press rewards are transcendental-free: bit-exact
    ref_rew = np.array([r["reward"] for r in records])
    np.testing.assert_array_equal(np.asarray(outs.reward), ref_rew)
    snap = records[-1]["snap"]
    np.testing.assert_array_equal(np.asarray(st_f.cont_true), snap["cont_true"])
    np.testing.assert_array_equal(np.asarray(st_f.press_q), snap["press_q"])
