"""Golden parity under non-default configs: sorting noise enabled
(exercises the uniform-noise draws end-to-end) and a non-default bale
size; plus full-train-state checkpoint/restore."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import state as S, step as ST

import reference_oracle as oracle


def test_parity_with_sorting_noise():
    cfg = load_config(max_steps=200, noise_sorting=0.05, balesize=200)
    seed, steps = 42, 150
    _, records = oracle.run_episode("mono", seed, steps, mode="rule_based",
                                    noise_sorting=0.05)
    st = S.reset(cfg, seed)

    def body(st, _):
        st, out = ST.step_mono_rule(cfg, st)
        return st, out

    st_f, outs = jax.jit(lambda st: lax.scan(body, st, None, length=steps))(st)
    np.testing.assert_array_equal(
        np.asarray(outs.obs), np.stack([r["obs"] for r in records]))
    np.testing.assert_allclose(
        np.asarray(outs.reward), np.array([r["reward"] for r in records]),
        rtol=0, atol=0)
    snap = records[-1]["snap"]
    np.testing.assert_array_equal(np.asarray(st_f.acc_belt), snap["acc_belt"])
    np.testing.assert_array_equal(np.asarray(st_f.cont_true), snap["cont_true"])


def test_parity_with_nonstandard_balesize():
    cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=150)
    seed, steps = 7, 150
    _, records = oracle.run_episode("mono", seed, steps, mode="rule_based",
                                    max_steps=200)
    # regenerate the oracle with balesize=150
    env = oracle.make_env("mono", max_steps=200, seed=seed, balesize=150)
    with oracle.reference_cwd():
        env.reset(seed=seed)
        records = []
        for _ in range(steps):
            obs, r, done, _, info = env.step(action=None, mode="rule_based")
            records.append({"obs": np.asarray(obs, np.float32),
                            "reward": np.float64(r),
                            "snap": oracle.snapshot(env)})
    st = S.reset(cfg, seed)

    def body(st, _):
        st, out = ST.step_mono_rule(cfg, st)
        return st, out

    st_f, outs = jax.jit(lambda st: lax.scan(body, st, None, length=steps))(st)
    np.testing.assert_array_equal(
        np.asarray(outs.obs), np.stack([r["obs"] for r in records]))
    snap = records[-1]["snap"]
    for row, mat in enumerate("ABCDE"):
        cnt = int(np.asarray(st_f.bale_cnt)[row])
        np.testing.assert_array_equal(
            np.asarray(st_f.bale_size)[row][:cnt],
            snap[f"bale_sizes_{mat}"], err_msg=mat)


def test_train_state_checkpoint_roundtrip(tmp_path):
    from marl_sortingenv_tpu.learn import ppo
    from marl_sortingenv_tpu.utils import checkpoint as CK

    cfg = load_config(max_steps=20)
    pcfg = ppo.PPOConfig(n_steps=8, batch_size=16, n_epochs=1)
    spec = ppo.spec_for("sort", engine="fast")
    ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=4)
    it = ppo.make_train_iteration(cfg, pcfg, spec)
    ts, _ = it(ts)

    CK.save_train_state(str(tmp_path / "ckpt"), 1, ts)
    assert CK.latest_step(str(tmp_path / "ckpt")) == 1
    restored = CK.restore_train_state(str(tmp_path / "ckpt"), 1, ts)
    np.testing.assert_array_equal(
        np.asarray(restored.params.action.w), np.asarray(ts.params.action.w))
    np.testing.assert_array_equal(
        np.asarray(restored.env_state.cont_true),
        np.asarray(ts.env_state.cont_true))
    # training continues from the restored state
    ts2, stats = it(restored)
    assert np.isfinite(float(stats["loss"]))
