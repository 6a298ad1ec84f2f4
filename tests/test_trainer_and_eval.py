"""End-to-end: training orchestration (tiny budget), checkpoint rotation,
5-policy benchmark harness, dashboard render, checksum."""

import os

import numpy as np
import jax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.eval import harness
from marl_sortingenv_tpu.eval.episode_log import checksum
from marl_sortingenv_tpu.learn import ppo, trainer
from marl_sortingenv_tpu.models import mlp
from marl_sortingenv_tpu.utils import checkpoint as CK

CFG = load_config(max_steps=40, noise_sorting=0.0, balesize=200)


def test_checkpoint_save_rotate_find(tmp_path):
    d = str(tmp_path / "models")
    params = mlp.init_params(jax.random.PRNGKey(0), 13, 2)
    p1 = CK.save_model(params, "PPO_Sorting", 100, d)
    assert os.path.exists(p1)
    p2 = CK.save_model(params, "PPO_Sorting", 200, d)
    assert os.path.exists(p2)
    assert os.path.exists(os.path.join(d, "prev", "PPO_Sorting_100.npz"))
    assert CK.find_latest_model("PPO_Sorting", d) == p2
    loaded = CK.load_model(p2, params)
    np.testing.assert_array_equal(
        np.asarray(loaded.action.w), np.asarray(params.action.w))


def test_train_agent_tiny(tmp_path):
    res = trainer.train_agent(
        CFG, "sort", total_timesteps=512, n_envs=8,
        use_action_masking=True, engine="parity", eval_freq=256,
        eval_envs=4, models_dir=str(tmp_path), save_prefix="PPO_Sorting",
        pcfg=ppo.PPOConfig(n_steps=32, batch_size=64, n_epochs=2),
        verbose=False)
    assert np.isfinite(res.final_eval_mean)
    assert CK.find_latest_model("PPO_Sorting", str(tmp_path)) is not None


def test_benchmark_harness_rule_based_matches_reference_range():
    # rule-based masked cumulative reward over 200 steps is ~43-45 in the
    # reference (BASELINE.md); run 3 seeds on full episodes
    cfg = load_config(max_steps=200)
    summary, rows = harness.run_model_benchmark(
        cfg, num_seeds=3, steps=200, include_random=True,
        sort_params=None, press_params=None, mono_params=None)
    rb = summary["Rule-Based"]
    assert 38.0 < rb["mean"] < 50.0, rb
    rnd = summary["Random"]
    assert -130.0 < rnd["mean"] < -40.0, rnd
    # Sort-Only with no params: random sort fallback + random masked press
    assert "PPO Sort-Only" in summary


def test_episode_render_and_checksum(tmp_path):
    cfg = load_config(max_steps=60)
    res = harness.run_episode(
        cfg, seed=42, steps=60, mode="rule_based", collect_series=True,
        render=True,
        render_kwargs={"save": True, "log_dir": str(tmp_path),
                       "filename": "dash", "fmt": "png"})
    assert os.path.exists(tmp_path / "dash.png")
    c = checksum(res.final_state)
    assert c["input_length"] == 60 * 100
    # conservation: checksum + stages == inputs
    st = res.final_state
    stages = int(np.asarray(st.input_counts).sum()
                 + np.asarray(st.belt_counts).sum())
    assert c["checksum"] + stages == c["input_length"]
