"""Experiment: scan unroll factors for GAE / update / rollout."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo

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
    return best, out


ts2, trs, lv = jax.jit(
    lambda ts: ppo.collect_rollout(cfg, pcfg, spec, ts, step_fn))(ts)
jax.block_until_ready(trs)


def gae_unrolled(unroll):
    @jax.jit
    def f(trs, last_value):
        def body(carry, x):
            gae, next_value = carry
            reward, value, done = x
            nonterminal = 1.0 - done.astype(F32)
            delta = reward + pcfg.gamma * next_value * nonterminal - value
            gae = delta + pcfg.gamma * pcfg.gae_lambda * nonterminal * gae
            return (gae, value), gae

        (_, _), adv = lax.scan(
            body, (jnp.zeros_like(last_value), last_value),
            (trs.reward, trs.value, trs.done), reverse=True, unroll=unroll)
        return adv, adv + trs.value

    return f


for u in (1, 8, 64):
    dt, (adv, ret) = t(gae_unrolled(u), trs, lv)
    print(f"gae unroll={u:3d}: {dt*1e3:8.2f} ms")

# update with unrolled minibatch scan: monkeypatch-style local copy
from marl_sortingenv_tpu.models import mlp


def update_unrolled(unroll_mb, unroll_ep):
    @jax.jit
    def f(ts, trs, advantages, returns):
        T, N = trs.action.shape
        total = T * N
        n_mb = max(1, total // pcfg.batch_size)
        mb_size = total // n_mb
        flat = (
            trs.obs.reshape(total, -1),
            trs.mask.reshape(total, -1),
            trs.action.reshape(total),
            trs.logp.reshape(total),
            advantages.reshape(total).astype(F32),
            returns.reshape(total).astype(F32),
        )
        tx = ppo.make_optimizer(pcfg)

        def epoch(carry, _):
            params, opt_state, key = carry
            key, pk = jax.random.split(key)
            perm = jax.random.permutation(pk, total)[: n_mb * mb_size]
            perm = perm.reshape(n_mb, mb_size)

            def minibatch(carry, idx):
                params, opt_state = carry
                batch = tuple(x[idx] for x in flat)
                (loss, stats), grads = jax.value_and_grad(
                    ppo._loss_fn, has_aux=True)(params, pcfg, batch)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                return (params, opt_state), stats

            (params, opt_state), stats = lax.scan(
                minibatch, (params, opt_state), perm, unroll=unroll_mb)
            return (params, opt_state, key), stats

        (params, opt_state, key), stats = lax.scan(
            epoch, (ts.params, ts.opt_state, ts.key), None,
            length=pcfg.n_epochs, unroll=unroll_ep)
        return params

    return f


adv, ret = gae_unrolled(1)(trs, lv)
for umb, uep in ((1, 1), (4, 1), (16, 1), (16, 4)):
    try:
        dt, _ = t(update_unrolled(umb, uep), ts2, trs, adv, ret)
        print(f"update unroll mb={umb:2d} ep={uep}: {dt*1e3:8.2f} ms")
    except Exception as e:
        print(f"update unroll mb={umb} ep={uep}: FAILED {type(e).__name__}")
