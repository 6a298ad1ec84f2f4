"""Fused pi+vf tower experiment for the PPO update (round 4): both MLP
towers have identical shapes, so layer 0 concatenates on the output axis
and deeper layers/heads form block-diagonal weights — 3 matmuls per
forward instead of 6 (and half the backward matmuls).  The vf-block
columns contribute exact zeros to the pi logits and vice versa, so
results are numerically identical up to ±0.0 sign.  Measures update-only
device+wall time vs the shipped _loss_fn."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo
from marl_sortingenv_tpu.models import mlp

F32 = jnp.float32
N, T = 8192, 64


def fused_forward_bl(params, obs):
    """(logits (A,B), value (B,)) in 3 matmuls."""
    H = params.pi[0].w.shape[1]
    A = params.action.w.shape[1]
    W0 = jnp.concatenate([params.pi[0].w, params.vf[0].w], 1)
    b0 = jnp.concatenate([params.pi[0].b, params.vf[0].b])
    h = jnp.tanh(W0.T @ obs + b0[:, None])
    z = jnp.zeros((H, H), F32)
    W1 = jnp.concatenate([
        jnp.concatenate([params.pi[1].w, z], 1),
        jnp.concatenate([z, params.vf[1].w], 1)], 0)
    b1 = jnp.concatenate([params.pi[1].b, params.vf[1].b])
    h = jnp.tanh(W1.T @ h + b1[:, None])
    Wh = jnp.concatenate([
        jnp.concatenate([params.action.w, jnp.zeros((H, 1), F32)], 1),
        jnp.concatenate([jnp.zeros((H, A), F32), params.value.w], 1)], 0)
    bh = jnp.concatenate([params.action.b, params.value.b])
    out = Wh.T @ h + bh[:, None]
    return out[:A], out[A]


def loss_fused(params, pcfg, batch):
    obs, mask, action, old_logp, advantage, ret = batch
    raw_logits, value = fused_forward_bl(params, obs)
    logits = mlp.masked_logits(raw_logits, mask)
    logp_all = jax.nn.log_softmax(logits, axis=0)
    onehot = (lax.broadcasted_iota(jnp.int32, logp_all.shape, 0)
              == action[None, :])
    logp = jnp.sum(jnp.where(onehot, logp_all, 0.0), axis=0)
    if pcfg.normalize_advantage:
        advantage = (advantage - advantage.mean()) / (advantage.std() + 1e-8)
    ratio = jnp.exp(logp - old_logp)
    pg1 = advantage * ratio
    pg2 = advantage * jnp.clip(ratio, 1.0 - pcfg.clip_range,
                               1.0 + pcfg.clip_range)
    policy_loss = -jnp.minimum(pg1, pg2).mean()
    value_loss = jnp.mean((ret - value) ** 2)
    p = jnp.exp(logp_all)
    ent_terms = jnp.where(mask, p * logp_all, 0.0)
    entropy = -jnp.sum(ent_terms, axis=0).mean()
    loss = (policy_loss + pcfg.vf_coef * value_loss
            - pcfg.ent_coef * entropy)
    stats = {
        "loss": loss, "policy_loss": policy_loss, "value_loss": value_loss,
        "entropy": entropy,
        "approx_kl": jnp.mean(old_logp - logp),
        "clip_frac": jnp.mean(
            (jnp.abs(ratio - 1.0) > pcfg.clip_range).astype(F32)),
    }
    return loss, stats


def main():
    cfg = load_config(bale_mode="events")
    spec = ppo.spec_for("mono", engine="fastb")

    for batch in (16384, 32768):
        pcfg = ppo.PPOConfig(n_steps=T, batch_size=batch, n_epochs=4,
                             shuffle_block=128)
        ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N, seed=0)
        step_fn = spec.step_fn(None, True)
        roll = jax.jit(lambda ts: ppo.collect_rollout(
            cfg, pcfg, spec, ts, step_fn, True))
        ts2, trs, lv = roll(ts)
        adv, ret = jax.jit(lambda t, l: ppo.compute_gae(pcfg, t, l))(trs, lv)
        jax.block_until_ready(adv)

        for label, lf in [("base ", ppo._loss_fn), ("fused", loss_fused)]:
            orig = ppo._loss_fn
            ppo._loss_fn = lf
            try:
                upd = jax.jit(lambda ts: ppo.ppo_update(pcfg, ts, trs,
                                                        adv, ret))
                o, st0 = upd(ts2)
                np.asarray(st0["loss"])
                best = np.inf
                for _ in range(3):
                    t0 = time.perf_counter()
                    c = ts2
                    for _ in range(16):
                        c, st = upd(c)
                    np.asarray(st["loss"])
                    best = min(best, (time.perf_counter() - t0) / 16)
                print(f"batch{batch} {label} update {best*1e3:7.2f} ms "
                      f"(loss {float(st0['loss']):+.6f})", flush=True)
            finally:
                ppo._loss_fn = orig


if __name__ == "__main__":
    main()
