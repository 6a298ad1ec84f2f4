"""Profiler-based comparison of update-loop variants: wall timing on the
tunneled TPU is unreliable for sub-ms programs (block_until_ready can
return early / quantize, artifacts/axon_timing.md), so each variant runs
under jax.profiler.trace and we report DEVICE time of the epoch while
loop and its hottest ops.
"""
import sys
import glob
import gzip
import json
import os
import collections

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax import lax
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo
from marl_sortingenv_tpu.models import mlp

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


def build_packed(trs, adv, ret):
    return jnp.concatenate([
        jnp.moveaxis(trs.obs, 0, 1).reshape(D, total),
        jnp.moveaxis(trs.mask, 0, 1).reshape(A, total).astype(F32),
        trs.action.reshape(1, total).astype(F32),
        trs.logp.reshape(1, total),
        adv.reshape(1, total).astype(F32),
        ret.reshape(1, total).astype(F32),
    ], axis=0).reshape(F, n_blocks, block)


packed_real = jax.jit(build_packed)(trs, adv, ret)
jax.block_until_ready(packed_real)


def make_loop(barrier, precision):
    def unpack(g):
        return (g[:D], g[D:D + A] > 0.5, g[D + A].astype(jnp.int32),
                g[D + A + 1], g[D + A + 2], g[D + A + 3])

    def loop(params, opt_state, key, packed):
        def epoch(carry, _):
            params, opt_state, key = carry
            key, pk = jax.random.split(key)
            perm = jax.random.permutation(pk, n_blocks)[: n_mb * mb_blocks]
            perm = perm.reshape(n_mb, mb_blocks)

            def minibatch(carry, idx):
                params, opt_state = carry
                g = jnp.take(packed, idx, axis=1).reshape(-1, mb_size)
                if barrier:
                    g = lax.optimization_barrier(g)
                if precision is None:
                    grads, stats = grad_fn(params, pcfg, unpack(g))
                else:
                    with jax.default_matmul_precision(precision):
                        grads, stats = grad_fn(params, pcfg, unpack(g))
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), stats["loss"]

            (params, opt_state), s = lax.scan(
                minibatch, (params, opt_state), perm)
            return (params, opt_state, key), s.sum()

        (params, opt_state, key), s = lax.scan(
            epoch, (params, opt_state, key), None, length=4)
        return s.sum()

    return loop


def profile_device(run, *args, label=""):
    o = run(*args)
    jax.block_until_ready(o)
    os.system("rm -rf /tmp/jt7")
    with jax.profiler.trace("/tmp/jt7"):
        o = run(*args)
        jax.block_until_ready(o)
    d = glob.glob("/tmp/jt7/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(d) as f:
        tr = json.load(f)
    tot = collections.Counter()
    cnt = collections.Counter()
    pids = {e["pid"] for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))}
    for e in tr["traceEvents"]:
        if (e.get("ph") == "X" and "dur" in e and e.get("pid") in pids
                and not e["name"].startswith("$")):
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    jit_total = max((v for k, v in tot.items() if k.startswith("jit_")),
                    default=0)
    print(f"\n=== {label}: device total {jit_total/1e3:.2f} ms")
    for nm, us in tot.most_common(6):
        if nm.startswith("jit_") or nm.startswith("while"):
            continue
        print(f"   {us:9.1f} us  x{cnt[nm]:4d}  {nm[:70]}")


variants = [
    ("no barrier, default precision", make_loop(False, None)),
    ("barrier, default precision", make_loop(True, None)),
    ("no barrier, float32 precision", make_loop(False, "float32")),
    ("barrier, float32 precision", make_loop(True, "float32")),
]
for label, loop in variants:
    run = jax.jit(loop)
    profile_device(run, ts2.params, ts2.opt_state, ts2.key, packed_real,
                   label=label)
