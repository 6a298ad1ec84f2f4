"""Reference-style entry points: test_env and Train_Agent shims."""

import numpy as np

from marl_sortingenv_tpu import envs as E
from marl_sortingenv_tpu import testing as T
from marl_sortingenv_tpu import training as TR


def test_test_env_shim_rule_based():
    env = E.Env_3_Monolith(max_steps=40, seed=42, noise_sorting=0.0)
    total, actions = T.test_env(env=env, steps=40, seed=42,
                                mode="rule_based", stats=False, save=False,
                                show=False)
    assert len(actions) == 40
    assert np.isfinite(total)
    # matches the reward_data-derived cumulative
    assert abs(total - float(np.sum(env.reward_data["Total"]))) < 1e-9


def test_test_env_shim_with_model_params():
    import jax
    from marl_sortingenv_tpu.models import mlp

    params = mlp.init_params(jax.random.PRNGKey(0), 29, 22)
    env = E.Env_3_Monolith(max_steps=30, seed=1, noise_sorting=0.0)
    total, actions = T.test_env(env=env, steps=30, seed=1, mode="model",
                                model=params, stats=False, save=False,
                                show=False)
    assert len(actions) == 30


def test_train_agent_shim(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    env = E.Env_1_Sorting(max_steps=20, seed=0, noise_sorting=0.0)
    params = TR.Train_Agent("PPO", env, total_timesteps=256,
                            use_action_masking=True, n_envs=4,
                            engine="parity")
    assert params.action.w.shape == (32, 2)
