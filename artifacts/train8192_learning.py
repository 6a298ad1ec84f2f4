"""Learning sanity of the BENCH train cadence (round 4): the throughput
surface's config (8192 envs, n_steps=64, batch 32768 = 16 mb/epoch,
4 epochs, tuned lr) must actually LEARN, not just go fast.  300
iterations (~19.7M env steps, ~6 s of device time) on the production
stack (fastb + event bale + full-step kernel); prints the
mean-episode-return trajectory.
"""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo

N = 8192
cfg = load_config(bale_mode="events")
# the EXACT bench train_iter_8192 config (reuses its compiled program)
pcfg = ppo.PPOConfig(n_steps=64, batch_size=32768, n_epochs=4,
                     shuffle_block=128)
spec = ppo.spec_for("mono", engine="fastb")
ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N, seed=0)
it = ppo.make_train_iteration(cfg, pcfg, spec)

t0 = time.perf_counter()
hist = []
for k in range(300):
    ts, stats = it(ts)
    if (k + 1) % 25 == 0:
        hist.append((k + 1, float(stats["mean_episode_return"])))
        print(f"iter {k+1:4d}  mean_episode_return "
              f"{hist[-1][1]:8.2f}", flush=True)
dt = time.perf_counter() - t0
print(f"300 iterations, {300*N*64/1e6:.1f}M env steps in {dt:.1f}s wall "
      f"({300*N*64/dt/1e6:.1f}M steps/s sustained incl. stat fetches)")
r0, rT = hist[0][1], hist[-1][1]
assert rT > r0 + 30, (r0, rT)
print(f"LEARNING OK: {r0:.1f} -> {rT:.1f}")
