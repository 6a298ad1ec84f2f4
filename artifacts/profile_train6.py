"""Bisect the real ppo_update (slow, ~19ms) against the structurally
identical synthetic repro (fast, ~0.1ms/epoch).  Variants strip one
difference at a time.  All on real rollout outputs.

CAVEAT (see profile_train7.py): wall timings here are fence-limited
(~22 ms completion-poll quantum) — use the profiler-based variant
comparison in profile_train7.py for real device numbers.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax import lax
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo

F32 = jnp.float32
N = 4096
cfg = load_config(bale_mode="events")
pcfg = ppo.PPOConfig(n_steps=64, batch_size=16384, n_epochs=4,
                     shuffle_block=128)
spec = ppo.spec_for("mono", engine="fastb")
ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N, seed=0)
step_fn = spec.step_fn(None, True)
ts2, trs, last_value = jax.jit(
    lambda ts: ppo.collect_rollout(cfg, pcfg, spec, ts, step_fn, True))(ts)
adv, ret = jax.jit(
    lambda t, lv: ppo.compute_gae(pcfg, t, lv))(trs, last_value)
jax.block_until_ready(adv)

T, Nn = trs.action.shape
total = T * Nn
block = 128
n_blocks = total // block
mb_size = 16384
mb_blocks = mb_size // block
n_mb = total // mb_size
D = trs.obs.shape[1]
A = trs.mask.shape[1]
F = D + A + 4

optimizer = ppo.make_optimizer(pcfg)
grad_fn = jax.grad(ppo._loss_fn, has_aux=True)


def unpack(g):
    return (g[:D], g[D:D + A] > 0.5, g[D + A].astype(jnp.int32),
            g[D + A + 1], g[D + A + 2], g[D + A + 3])


def build_packed(trs, adv, ret):
    return jnp.concatenate([
        jnp.moveaxis(trs.obs, 0, 1).reshape(D, total),
        jnp.moveaxis(trs.mask, 0, 1).reshape(A, total).astype(F32),
        trs.action.reshape(1, total).astype(F32),
        trs.logp.reshape(1, total),
        adv.reshape(1, total).astype(F32),
        ret.reshape(1, total).astype(F32),
    ], axis=0).reshape(F, n_blocks, block)


def loop(params, opt_state, key, packed, with_stats):
    def epoch(carry, _):
        params, opt_state, key = carry
        key, pk = jax.random.split(key)
        perm = jax.random.permutation(pk, n_blocks)[: n_mb * mb_blocks]
        perm = perm.reshape(n_mb, mb_blocks)

        def minibatch(carry, idx):
            params, opt_state = carry
            g = jnp.take(packed, idx, axis=1).reshape(-1, mb_size)
            grads, stats = grad_fn(params, pcfg, unpack(g))
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            out = stats if with_stats else stats["loss"]
            return (params, opt_state), out

        (params, opt_state), s = lax.scan(minibatch, (params, opt_state),
                                          perm)
        s = jax.tree.map(jnp.mean, s) if with_stats else s.sum()
        return (params, opt_state, key), s

    (params, opt_state, key), s = lax.scan(
        epoch, (params, opt_state, key), None, length=4)
    return params, jax.tree.map(jnp.mean, s) if with_stats else s.sum()


def timeit(run, *args):
    o = run(*args)
    jax.block_until_ready(o[-1] if isinstance(o, tuple) else o)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = run(*args)
        jax.block_until_ready(o[-1] if isinstance(o, tuple) else o)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


# V1: loop on real packed built OUTSIDE (entry param), no stats
packed_real = jax.jit(build_packed)(trs, adv, ret)
jax.block_until_ready(packed_real)
run = jax.jit(lambda p, o, k, pk: loop(p, o, k, pk, False))
print("V1 loop only, packed entry, no stats:  %7.2f ms"
      % timeit(run, ts2.params, ts2.opt_state, ts2.key, packed_real))

# V2: + stats dict through the scans
run = jax.jit(lambda p, o, k, pk: loop(p, o, k, pk, True))
print("V2 + stats dict:                       %7.2f ms"
      % timeit(run, ts2.params, ts2.opt_state, ts2.key, packed_real))

# V3: packed built inside the same jit from trs/adv/ret
def v3(params, opt_state, key, trs, adv, ret):
    packed = build_packed(trs, adv, ret)
    return loop(params, opt_state, key, packed, False)
run = jax.jit(v3)
print("V3 + build inside jit:                 %7.2f ms"
      % timeit(run, ts2.params, ts2.opt_state, ts2.key, trs, adv, ret))

# V4: the actual ppo_update
def v4(ts, trs, adv, ret):
    ts, stats = ppo.ppo_update(pcfg, ts, trs, adv, ret)
    return ts.params, stats["loss"]
run = jax.jit(v4)
print("V4 real ppo_update:                    %7.2f ms"
      % timeit(run, ts2, trs, adv, ret))
