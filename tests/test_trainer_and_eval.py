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


def test_train_resume_bitwise(tmp_path, monkeypatch):
    """VERDICT r4 #4: kill a run mid-flight (an exception thrown from the
    2nd eval), resume from the durable full-state checkpoint, and prove
    the resumed run's parameters are BITWISE-equal to an uninterrupted
    run — the sharding-equivalence standard applied to resume."""
    cfg = load_config(max_steps=40, noise_sorting=0.0, balesize=200)
    pcfg = ppo.PPOConfig(n_steps=16, batch_size=32, n_epochs=2)
    kw = dict(total_timesteps=1024, n_envs=8, use_action_masking=True,
              engine="fastb", eval_freq=256, eval_envs=4, seed=3,
              pcfg=pcfg, verbose=False)

    ref = trainer.train_agent(cfg, "mono", models_dir=str(tmp_path / "mA"),
                              ckpt_dir=str(tmp_path / "ckA"), **kw)

    ck = str(tmp_path / "ckB")
    real_eval = ppo.evaluate
    calls = {"n": 0}

    def killing_eval(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated kill")
        return real_eval(*a, **k)

    monkeypatch.setattr(trainer.ppo, "evaluate", killing_eval)
    try:
        trainer.train_agent(cfg, "mono", models_dir=str(tmp_path / "mB"),
                            ckpt_dir=ck, **kw)
        raise AssertionError("kill did not fire")
    except KeyboardInterrupt:
        pass
    monkeypatch.setattr(trainer.ppo, "evaluate", real_eval)
    # the checkpoint on disk is from the FIRST eval boundary only
    assert CK.latest_step(ck) == 256

    res = trainer.train_agent(cfg, "mono", models_dir=str(tmp_path / "mB"),
                              ckpt_dir=ck, resume=True, **kw)
    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert res.final_eval_mean == ref.final_eval_mean
    # retention: at most 2 step_* dirs survive
    steps = [d for d in os.listdir(ck) if d.startswith("step_")]
    assert 1 <= len(steps) <= 2
