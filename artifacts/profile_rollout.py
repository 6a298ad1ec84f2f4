"""Ablate collect_rollout components to locate the rollout overhead."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax import lax
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo
from marl_sortingenv_tpu.models import mlp

N_ENVS = 4096
pcfg = ppo.PPOConfig(n_steps=64, batch_size=16384, n_epochs=4)
cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)
spec = ppo.spec_for("mono", engine="fastb")
ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N_ENVS, seed=0)
step_fn = spec.step_fn(use_action_masking=True)
F32 = jnp.float32


def t(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def make_rollout(sample_mode="full", store="full", use_masks=True):
    batched = spec.batched_autoreset_step(cfg, step_fn)
    masks_of = spec.batched_masks(cfg)
    ones = jnp.ones((N_ENVS, spec.n_actions), bool)

    @jax.jit
    def run(ts):
        def body(carry, _):
            env_state, obs, key, acc, last_ret = carry
            mask = masks_of(env_state) if use_masks else ones
            key, sk = jax.random.split(key)
            if sample_mode == "full":
                action, logp, value = ppo._sample(ts.params, obs, mask, sk)
            elif sample_mode == "argmax":
                action = mlp.predict_deterministic(ts.params, obs, mask)
                logp = jnp.zeros((N_ENVS,), F32)
                value = jnp.zeros((N_ENVS,), F32)
            elif sample_mode == "novalue":
                logits = mlp.masked_logits(
                    mlp.policy_logits(ts.params, obs), mask)
                logp_all = jax.nn.log_softmax(logits, axis=-1)
                action = jax.random.categorical(sk, logits).astype(jnp.int32)
                logp = jnp.take_along_axis(
                    logp_all, action[..., None], axis=-1)[..., 0]
                value = jnp.zeros((N_ENVS,), F32)
            env_state, out = batched(env_state, action)
            acc = acc + out.reward.astype(acc.dtype)
            last_ret = jnp.where(out.terminated, acc, last_ret)
            acc = jnp.where(out.terminated, 0.0, acc)
            if store == "full":
                ys = (obs, mask, action, logp, value,
                      out.reward.astype(F32), out.terminated)
            else:
                ys = (action,)
            return (env_state, out.obs, key, acc, last_ret), ys

        carry, ys = lax.scan(
            body, (ts.env_state, ts.obs, ts.key, ts.ep_return_acc,
                   ts.last_ep_return), None, length=pcfg.n_steps)
        return carry[0], ys[-1]

    return run


for tag, kw in [
    ("full", {}),
    ("argmax-nostore", dict(sample_mode="argmax", store="min")),
    ("argmax-store", dict(sample_mode="argmax")),
    ("novalue", dict(sample_mode="novalue")),
    ("full-nostore", dict(store="min")),
    ("full-nomask", dict(use_masks=False)),
]:
    dt = t(make_rollout(**kw), ts)
    steps = N_ENVS * pcfg.n_steps
    print(f"{tag:18s}: {dt*1e3:7.2f} ms ({steps/dt/1e6:5.2f}M steps/s)")
