"""Round-3: decompose the jitted PPO train iteration on the real TPU.

BENCH_r02: train_iter = 3.06M env-steps/s (~86ms/iter) vs 25.3M raw rollout
(~10ms for 4096x64).  Where do the other ~75ms go?  Times each stage as its
own jitted function at the bench config (4096 envs, n_steps=64,
batch_size=16384, n_epochs=4, fastb mono):

  rollout   — collect_rollout scan (policy sample + env step + autoreset)
  gae       — reverse scan over [64, 4096]
  update    — 4 epochs x (permutation + 16 minibatch grad steps)
  update/id — same with identity permutation (isolates the sort)
  sort262k  — bare jax.random.permutation(262144) (the suspected cost)
  grad16k   — one minibatch grad+adam step at 16384

Each timed via an on-device repeat where feasible; stages are serialized
through data dependencies on their own outputs.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo
import optax

N_ENVS, N_STEPS, BATCH, EPOCHS = 4096, 64, 16384, 4

cfg = load_config()
pcfg = ppo.PPOConfig(n_steps=N_STEPS, batch_size=BATCH, n_epochs=EPOCHS)
spec = ppo.spec_for("mono", engine="fastb")
ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N_ENVS, seed=0)
step_fn = spec.step_fn(None, True)


def t(run, *args, reps=5):
    out = run(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


# --- full iteration ---------------------------------------------------------
it = ppo.make_train_iteration(cfg, pcfg, spec)
full = t(lambda ts: it(ts)[1]["loss"], ts)
print(f"full iteration : {full*1e3:8.2f} ms  "
      f"({N_ENVS*N_STEPS/full/1e6:6.2f}M env-steps/s)")

# --- rollout only ------------------------------------------------------------
roll = jax.jit(lambda ts: ppo.collect_rollout(cfg, pcfg, spec, ts, step_fn)[1])
troll = t(lambda ts: jax.tree.leaves(roll(ts))[0], ts)
print(f"rollout        : {troll*1e3:8.2f} ms")

ts2, trs, last_value = jax.jit(
    lambda ts: ppo.collect_rollout(cfg, pcfg, spec, ts, step_fn))(ts)
jax.block_until_ready(last_value)

# --- GAE ---------------------------------------------------------------------
gae = jax.jit(lambda trs, lv: ppo.compute_gae(pcfg, trs, lv))
tgae = t(lambda a: gae(*a)[0], (trs, last_value))
adv, ret = gae(trs, last_value)
print(f"gae            : {tgae*1e3:8.2f} ms")

# --- update ------------------------------------------------------------------
upd = jax.jit(lambda ts, trs, adv, ret: ppo.ppo_update(
    pcfg, ts, trs, adv, ret)[1]["loss"])
tupd = t(lambda a: upd(*a), (ts2, trs, adv, ret))
print(f"update         : {tupd*1e3:8.2f} ms")

# --- update with identity permutation (monkeypatch) -------------------------
orig_perm = jax.random.permutation
try:
    jax.random.permutation = lambda k, n: jnp.arange(n)  # type: ignore
    upd_id = jax.jit(lambda ts, trs, adv, ret: ppo.ppo_update(
        pcfg, ts, trs, adv, ret)[1]["loss"])
    tupd_id = t(lambda a: upd_id(*a), (ts2, trs, adv, ret))
    print(f"update/identity: {tupd_id*1e3:8.2f} ms   (sort cost ~ "
          f"{(tupd-tupd_id)*1e3:.2f} ms)")
finally:
    jax.random.permutation = orig_perm

# --- bare permutation of 262144 ---------------------------------------------
total = N_ENVS * N_STEPS


def perm_chain(key):
    def body(key, _):
        key, pk = jax.random.split(key)
        p = jax.random.permutation(pk, total)
        # data-depend the next key on the output so the loop can't hoist
        return jax.random.fold_in(key, p[0]), ()
    return lax.scan(body, key, None, length=8)[0]


tperm = t(jax.jit(perm_chain), jax.random.PRNGKey(0)) / 8
print(f"sort262k       : {tperm*1e3:8.2f} ms/permutation")

# --- one minibatch grad step --------------------------------------------------
flat_obs = trs.obs.reshape(total, -1)[:BATCH]
flat_mask = trs.mask.reshape(total, -1)[:BATCH]
flat_act = trs.action.reshape(total)[:BATCH]
flat_logp = trs.logp.reshape(total)[:BATCH]
flat_adv = adv.reshape(total)[:BATCH].astype(jnp.float32)
flat_ret = ret.reshape(total)[:BATCH].astype(jnp.float32)
optimizer = ppo.make_optimizer(pcfg)
grad_fn = jax.grad(ppo._loss_fn, has_aux=True)


def grad_chain(params, opt_state):
    def body(carry, _):
        params, opt_state = carry
        grads, stats = grad_fn(params, pcfg, (flat_obs, flat_mask, flat_act,
                                              flat_logp, flat_adv, flat_ret))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), stats["loss"]
    return lax.scan(body, (params, opt_state), None, length=64)[1]


tgrad = t(jax.jit(grad_chain), ts.params, ts.opt_state) / 64
print(f"grad16k        : {tgrad*1e3:8.2f} ms/minibatch  "
      f"(x{EPOCHS*(total//BATCH)} per iter = "
      f"{tgrad*EPOCHS*(total//BATCH)*1e3:.2f} ms)")

print(f"\naccounted: rollout {troll*1e3:.1f} + gae {tgae*1e3:.1f} + "
      f"update {tupd*1e3:.1f} = {(troll+tgae+tupd)*1e3:.1f} ms "
      f"vs full {full*1e3:.1f} ms")
