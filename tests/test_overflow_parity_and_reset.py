"""Host-wrapper behavioral parity for the two round-2 fixes:

* ``step(check_overflow=True)`` on all three envs routed through
  ``core.wrappers.with_overflow_termination`` — golden parity against the
  reference's overflow-termination path (env_1_sort.py:133-142,
  env_2_press.py:145-153, env_monolith.py:265-272), which no reference
  caller exercises but the API exposes.
* ``reset(seed=None)`` continues the live RNG streams
  (env_super.py:375-378 semantics): consecutive unseeded episodes differ,
  while ``reset(seed=k)`` replays bit-exactly.
"""

import numpy as np
import pytest

from marl_sortingenv_tpu.envs import (
    Env_1_Sorting, Env_2_Pressing, Env_3_Monolith)

import reference_oracle as oracle


def _run_ref(variant, seed, steps, actions=None, mode=None):
    env = oracle.make_env(variant, max_steps=200, seed=seed,
                          noise_sorting=0.0)
    with oracle.reference_cwd():
        env.reset(seed=seed)
        recs = []
        for t in range(steps):
            if variant == "mono":
                obs, r, done, _, info = env.step(
                    action=(int(actions[t]) if actions is not None else None),
                    mode=mode, use_action_masking=True, check_overflow=True)
            elif variant == "sort":
                obs, r, done, _, info = env.step(
                    action=int(actions[t]), check_overflow=True)
            else:
                obs, r, done, _, info = env.step(
                    int(actions[t]), use_action_masking=True,
                    check_overflow=True)
            recs.append({
                "obs": np.asarray(obs, np.float32),
                "reward": float(r),
                "terminated": bool(done),
                "info": dict(info),
                "pair": tuple(
                    np.asarray(env.reward_data["Reward"][-1], np.float64)),
            })
            if done:
                break
        return recs


def _run_ours(cls, seed, steps, actions=None, mode=None):
    env = cls(max_steps=200, seed=seed, noise_sorting=0.0)
    env.reset(seed=seed)
    recs = []
    for t in range(steps):
        if cls is Env_3_Monolith:
            obs, r, done, _, info = env.step(
                action=(int(actions[t]) if actions is not None else None),
                mode=mode, use_action_masking=True, check_overflow=True)
        else:
            obs, r, done, _, info = env.step(
                int(actions[t]), use_action_masking=True,
                check_overflow=True)
        recs.append({
            "obs": np.asarray(obs, np.float32),
            "reward": float(r),
            "terminated": bool(done),
            "info": dict(info),
            "pair": tuple(
                np.asarray(env.reward_data["Reward"][-1], np.float64)),
        })
        if done:
            break
    return recs


def _compare(ref, ours, check_action=True):
    assert len(ref) == len(ours), (len(ref), len(ours))
    for t, (a, b) in enumerate(zip(ref, ours)):
        np.testing.assert_array_equal(b["obs"], a["obs"],
                                      err_msg=f"step {t} obs")
        assert b["reward"] == a["reward"], (t, b["reward"], a["reward"])
        assert b["terminated"] == a["terminated"], t
        assert b["pair"] == a["pair"], (t, b["pair"], a["pair"])
        assert b["info"].get("overflow") == a["info"].get("overflow"), t
        assert (b["info"].get("overflow_material")
                == a["info"].get("overflow_material")), t
        if check_action and "overflow" not in a["info"]:
            assert b["info"]["action"] == a["info"]["action"], t


def test_mono_overflow_termination_parity():
    """All-no-op monolith overflows a container well before max_steps; the
    terminal step must carry -10 (logged as -5/-5), overflow info, and
    terminated=True — bit-matching the reference."""
    actions = np.zeros(120, np.int64)  # sort mode 0, press no-op
    ref = _run_ref("mono", 3, 120, actions=actions)
    ours = _run_ours(Env_3_Monolith, 3, 120, actions=actions)
    assert ref[-1]["terminated"] and ref[-1]["info"].get("overflow")
    assert ref[-1]["reward"] == -10.0 and ref[-1]["pair"] == (-5.0, -5.0)
    assert len(ref) < 120  # genuinely terminated early
    _compare(ref, ours)


def test_press_overflow_termination_parity():
    actions = np.zeros(120, np.int64)  # press no-op; rule-based sorting
    ref = _run_ref("press", 5, 120, actions=actions)
    ours = _run_ours(Env_2_Pressing, 5, 120, actions=actions)
    assert ref[-1]["info"].get("overflow")
    assert ref[-1]["pair"] == (0.0, -10.0)
    _compare(ref, ours)


def test_sort_check_overflow_path_parity():
    """Sorting env: the press side presses via the masked-random stream, so
    overflow rarely triggers — this exercises the check_overflow=True
    codepath parity (incl. the no-overflow branch) for 60 steps."""
    actions = np.tile([0, 1], 30).astype(np.int64)
    ref = _run_ref("sort", 11, 60, actions=actions)
    # reference env1 reports the *press* action in the overflow info dict
    # (env_1_sort.py:139) while normal steps report the sort mode; we keep
    # the sort mode — compare actions only on non-overflow steps.
    ours = _run_ours(Env_1_Sorting, 11, 60, actions=actions)
    _compare(ref, ours)


def _episode(env, seed, n=15):
    obs0, _ = env.reset(seed=seed)
    rewards, obs = [], []
    for _ in range(n):
        o, r, *_ = env.step(mode="rule_based")
        rewards.append(r)
        obs.append(o)
    return obs0, np.asarray(rewards), np.asarray(obs)


def test_reset_none_continues_streams():
    """Two consecutive reset(seed=None) episodes must differ (streams keep
    running), while reset(seed=k) replays the seeded episode bit-exactly.
    Matches env_super.py:375-378 intent (deterministic variant — see
    core/wrappers.autoreset docstring)."""
    env = Env_3_Monolith(max_steps=200, seed=42, noise_sorting=0.0)
    _, r_seeded, o_seeded = _episode(env, seed=42)

    # unseeded resets: continue the live streams
    obs1, r1, o1 = _episode(env, seed=None)
    obs2, r2, o2 = _episode(env, seed=None)
    assert not np.array_equal(o1, o2) or not np.array_equal(r1, r2)
    assert not np.array_equal(o1, o_seeded) or not np.array_equal(
        r1, r_seeded)

    # re-seeding replays bit-exactly
    _, r_again, o_again = _episode(env, seed=42)
    np.testing.assert_array_equal(o_again, o_seeded)
    np.testing.assert_array_equal(r_again, r_seeded)


def test_reset_none_sort_and_press():
    for cls, kwargs in ((Env_1_Sorting, {}), (Env_2_Pressing, {})):
        env = cls(max_steps=200, seed=7, noise_sorting=0.0)
        env.reset(seed=7)
        t1 = [env.step(0)[0] for _ in range(10)]
        env.reset(seed=None)
        t2 = [env.step(0)[0] for _ in range(10)]
        assert not all(np.array_equal(a, b) for a, b in zip(t1, t2)), cls
        env.reset(seed=7)
        t3 = [env.step(0)[0] for _ in range(10)]
        for a, b in zip(t1, t3):
            np.testing.assert_array_equal(a, b)
