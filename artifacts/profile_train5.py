"""Microbench the PPO update internals at the bench config (4096 envs x
64 steps, batch 16384, shuffle_block 128): gather-only vs grad-only vs
full minibatch step, plus the packed-buffer build, each as an on-device
chained scan with one fence.

CAVEAT (see profile_train7.py): the sub-ms wall timings below are
UNRELIABLE on the tunneled client — block_until_ready returned
before device completion for small programs, making several rows
impossibly fast.  The profiler-based bisection in profile_train7.py
supersedes these numbers; kept as the record of the hunt.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax import lax
from marl_sortingenv_tpu.learn import ppo
from marl_sortingenv_tpu.models import mlp

F32 = jnp.float32
T, N = 64, 4096
total = T * N
block = 128
n_blocks = total // block
mb_size = 16384
mb_blocks = mb_size // block
n_mb = total // mb_size
D, A = 29, 22
F = D + A + 4

key = jax.random.PRNGKey(0)
packed = jax.random.normal(key, (n_blocks, block, F), F32)
params = mlp.init_params(key, D, A)
pcfg = ppo.PPOConfig(n_steps=T, batch_size=mb_size, n_epochs=4,
                     shuffle_block=block)
optimizer = ppo.make_optimizer(pcfg)
opt_state = optimizer.init(params)
grad_fn = jax.grad(ppo._loss_fn, has_aux=True)
perm_all = jax.random.permutation(key, n_blocks).reshape(n_mb, mb_blocks)


def unpack(g):
    a = jnp.clip(g[:, D + A].astype(jnp.int32), 0, A - 1)
    return (g[:, :D], g[:, D:D + A] > 0.5, a, g[:, D + A + 1],
            g[:, D + A + 2], g[:, D + A + 3])


def timeit(fn, *args, iters=64):
    run = jax.jit(fn)
    out = run(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e6  # us per inner iteration


# 1. gather-only: 64 gathers in a scan
def gather_only(packed, perm):
    def body(s, idx):
        g = packed[idx].reshape(mb_size, F)
        return s + g.sum(), ()
    def rep(s, _):
        s, _ = lax.scan(body, s, perm)
        return s, ()
    return lax.scan(rep, jnp.float32(0), None, length=64 // n_mb)[0]

us = timeit(gather_only, packed, perm_all)
print(f"gather-only:        {us:8.1f} us/minibatch")


# 2. grad-only on a fixed minibatch (no gather), 64 steps
gfix = packed[:mb_blocks].reshape(mb_size, F)


def grad_only(params, opt_state, gfix):
    batch = unpack(gfix)
    def body(carry, _):
        params, opt_state = carry
        grads, stats = grad_fn(params, pcfg, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, opt_state), stats["loss"]
    (params, opt_state), losses = lax.scan(
        body, (params, opt_state), None, length=64)
    return losses.sum()

us = timeit(grad_only, params, opt_state, gfix)
print(f"grad-only (fixed):  {us:8.1f} us/minibatch")


# 3. full minibatch step (gather + grad + adam), 64 steps
def full_mb(params, opt_state, packed, perm):
    def body(carry, idx):
        params, opt_state = carry
        batch = unpack(packed[idx].reshape(mb_size, F))
        grads, stats = grad_fn(params, pcfg, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, opt_state), stats["loss"]
    def rep(carry, _):
        carry, losses = lax.scan(body, carry, perm)
        return carry, losses.sum()
    (params, opt_state), s = lax.scan(
        rep, (params, opt_state), None, length=64 // n_mb)
    return s.sum()

us = timeit(full_mb, params, opt_state, packed, perm_all)
print(f"full minibatch:     {us:8.1f} us/minibatch")


# 4. forward+loss only (no grad), fixed minibatch
def fwd_only(params, gfix):
    batch = unpack(gfix)
    def body(s, _):
        loss, stats = ppo._loss_fn(params, pcfg, batch)
        return s + loss, ()
    return lax.scan(body, jnp.float32(0), None, length=64)[0]

us = timeit(fwd_only, params, gfix)
print(f"fwd+loss only:      {us:8.1f} us/minibatch")


# 5. packed-buffer build (the per-update constant)
obs = jax.random.normal(key, (T, N, D), F32)
mask = jnp.ones((T, N, A), bool)
action = jnp.zeros((T, N), jnp.int32)
logp = jnp.zeros((T, N), F32)
adv = jnp.zeros((T, N), F32)
ret = jnp.zeros((T, N), F32)


def build(obs, mask, action, logp, adv, ret):
    p = jnp.concatenate([
        obs.reshape(total, D), mask.reshape(total, A).astype(F32),
        action.reshape(total, 1).astype(F32), logp.reshape(total, 1),
        adv.reshape(total, 1), ret.reshape(total, 1)], axis=-1)
    return p.reshape(n_blocks, block, F).sum()

us = timeit(lambda *a: build(*a), obs, mask, action, logp, adv, ret,
            iters=1)
print(f"packed build:       {us:8.1f} us/update")

# 6. permutation draw
us = timeit(lambda k: jax.random.permutation(k, n_blocks).sum(), key,
            iters=1)
print(f"perm draw:          {us:8.1f} us/epoch")


# 7. ppo_update standalone on REAL rollout outputs (materialized trs)
from marl_sortingenv_tpu.config.config import load_config
cfg = load_config(bale_mode="events")
spec = ppo.spec_for("mono", engine="fastb")
ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N, seed=0)
step_fn = spec.step_fn(None, True)
ts2, trs, last_value = jax.jit(
    lambda ts: ppo.collect_rollout(cfg, pcfg, spec, ts, step_fn, True))(ts)
adv, ret = jax.jit(lambda t, lv: ppo.compute_gae(pcfg, t, lv))(trs, last_value)
jax.block_until_ready(adv)


def upd(ts, trs, adv, ret):
    ts, stats = ppo.ppo_update(pcfg, ts, trs, adv, ret)
    return ts, stats["loss"]


run = jax.jit(upd)
ts3, loss = run(ts2, trs, adv, ret)
jax.block_until_ready(loss)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    o = run(ts2, trs, adv, ret)
    jax.block_until_ready(o[1])
    best = min(best, time.perf_counter() - t0)
print(f"ppo_update standalone (4 epochs): {best*1e3:8.2f} ms")
