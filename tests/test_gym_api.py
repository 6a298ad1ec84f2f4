"""Drop-in Gymnasium API: same classes/signatures as the reference, same
trajectories as the reference implementation under a fixed seed."""

import numpy as np
import jax
import pytest

from marl_sortingenv_tpu import envs as E

import reference_oracle as oracle


def test_monolith_gym_wrapper_matches_reference_rule_based():
    ours = E.Env_3_Monolith(max_steps=80, seed=42, noise_sorting=0.0,
                            balesize=200)
    obs0, _ = ours.reset(seed=42)
    _, records = oracle.run_episode("mono", 42, 80, mode="rule_based")
    for t, rec in enumerate(records):
        obs, r, done, trunc, info = ours.step(action=None, mode="rule_based")
        np.testing.assert_array_equal(obs, rec["obs"], err_msg=f"t={t}")
        assert r == rec["reward"]
        assert info["action"] == rec["action"]


def test_monolith_gym_wrapper_random_mode_matches():
    ours = E.Env_3_Monolith(max_steps=60, seed=7, noise_sorting=0.0,
                            balesize=200)
    ours.reset(seed=7)
    _, records = oracle.run_episode("mono", 7, 60, mode="random")
    for t, rec in enumerate(records):
        obs, r, done, trunc, info = ours.step(action=None, mode="random")
        assert info["action"] == rec["action"], t
        np.testing.assert_array_equal(obs, rec["obs"])


def test_sorting_env_gym_contract():
    env = E.Env_1_Sorting(max_steps=20, seed=1, noise_sorting=0.0)
    obs, info = env.reset(seed=1)
    assert obs.shape == (13,)
    assert env.action_space.n == 2
    total = 0.0
    for t in range(20):
        obs, r, done, trunc, info = env.step(t % 2)
        total += r
        assert obs.shape == (13,)
        assert np.all(obs >= -1.0) and np.all(obs <= 1.0)
    assert done
    assert len(env.reward_data["Total"]) == 20


def test_pressing_env_with_frozen_agent_and_masks():
    from marl_sortingenv_tpu.models import mlp

    params = mlp.init_params(jax.random.PRNGKey(0), 13, 2)
    env = E.Env_2_Pressing(max_steps=30, seed=3, noise_sorting=0.0)
    env.reset(seed=3)
    env.set_agents(sort_agent=params)
    rng = np.random.default_rng(0)
    for t in range(30):
        mask = env.action_masks()
        assert mask[0]
        a = int(rng.choice(np.flatnonzero(mask)))
        obs, r, done, trunc, info = env.step(a)
        assert obs.shape == (16,)
    assert done


def test_reference_like_accessors():
    env = E.Env_3_Monolith(max_steps=50, seed=5, noise_sorting=0.0)
    env.reset(seed=5)
    for _ in range(50):
        env.step(action=None, mode="rule_based")
    cm = env.container_materials
    assert set(cm) == {"A", "B", "C", "D", "A_False", "B_False", "C_False",
                       "D_False", "E"}
    ps = env.press_state
    assert set(ps) == {"press_1", "material_1", "n_1", "q_1",
                       "press_2", "material_2", "n_2", "q_2"}
    bc = env.bale_count
    assert set(bc) == set("ABCDE")
    assert env.current_step == 50


def test_gymnasium_env_checker():
    gym = pytest.importorskip("gymnasium")
    from gymnasium.utils.env_checker import check_env as gym_check

    env = E.Env_1_Sorting(max_steps=10, seed=0, noise_sorting=0.0)
    # gymnasium's checker calls reset/step with standard signatures
    try:
        gym_check(env, skip_render_check=True)
    except Exception as e:  # pragma: no cover - informative failure
        # the reference itself is not fully gymnasium-compliant (it returns
        # terminated for truncation); accept checker warnings-as-errors
        # only for API-shape failures
        msg = str(e)
        assert "truncat" in msg.lower() or "seed" in msg.lower(), msg
