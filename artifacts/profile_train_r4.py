"""Round-4 PPO-update bisection (VERDICT r3 next-round #3): the train
iteration at 8192 envs spends ~2/3 of its time in GAE + minibatch grad
steps that are dispatch/latency-bound, not arithmetic-bound.  This
script times the UPDATE PHASE alone (rollout factored out by reusing one
captured rollout) under candidate structural changes:

  base      — ppo_update as shipped (scan over minibatches, scan epochs)
  unrollK   — lax.scan(..., unroll=K) on the minibatch scan
  batchB    — fatter minibatches (fewer grad steps/epoch)

Each cell reports updates-phase ms and the implied full-iteration
env-steps/s (update + measured rollout time), chained dispatches with a
single to-host fence as in bench.py.

Run on the real chip:  python artifacts/profile_train_r4.py
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo

N_ENVS = 8192
N_STEPS = 64
CHAIN = 16


def time_chain(run, carry, chain=CHAIN, repeats=3):
    carry, s = run(carry)
    np.asarray(s)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = carry
        for _ in range(chain):
            c, s = run(c)
        np.asarray(s)
        best = min(best, (time.perf_counter() - t0) / chain)
        carry = c
    return best


def main():
    cfg = load_config(bale_mode="events")
    spec = ppo.spec_for("mono", engine="fastb")

    def setup(batch, shuffle_block=128):
        pcfg = ppo.PPOConfig(n_steps=N_STEPS, batch_size=batch,
                             n_epochs=4, shuffle_block=shuffle_block)
        ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N_ENVS, seed=0)
        step_fn = spec.step_fn(None, True)

        @jax.jit
        def rollout(ts):
            ts, trs, last_value = ppo.collect_rollout(
                cfg, pcfg, spec, ts, step_fn, True)
            adv, ret = ppo.compute_gae(pcfg, trs, last_value)
            return ts, trs, adv, ret

        ts, trs, adv, ret = rollout(ts)
        jax.block_until_ready(adv)
        return pcfg, ts, trs, adv, ret, rollout

    # rollout+GAE time (the non-update part of the iteration)
    pcfg0, ts0, trs0, adv0, ret0, rollout = setup(16384)
    t_roll = time_chain(lambda t: (lambda r: (r[0], r[2]))(rollout(t)), ts0,
                        chain=8)
    print(f"rollout+GAE: {t_roll*1e3:8.3f} ms "
          f"({N_ENVS*N_STEPS/t_roll/1e6:7.1f}M steps/s)")

    def update_only(pcfg, ts, trs, adv, ret):
        @jax.jit
        def upd(ts):
            ts2, stats = ppo.ppo_update(pcfg, ts, trs, adv, ret)
            # chain through params only (env state untouched by update)
            return ts2, stats["loss"]

        return time_chain(upd, ts, chain=CHAIN)

    for label, batch in [("batch16384", 16384), ("batch32768", 32768),
                         ("batch65536", 65536), ("batch131072", 131072)]:
        pcfg, ts, trs, adv, ret, _ = setup(batch)
        t_upd = update_only(pcfg, ts, trs, adv, ret)
        total = t_roll + t_upd
        n_grad = (N_ENVS * N_STEPS // batch) * 4
        print(f"{label:12s} update {t_upd*1e3:8.3f} ms "
              f"({n_grad} grad steps, {t_upd/n_grad*1e6:6.1f} us/step) "
              f"-> iter {N_ENVS*N_STEPS/total/1e6:7.1f}M steps/s, "
              f"{1.0/total:6.1f} up/s")


if __name__ == "__main__":
    main()
