"""Split _sort_material's cost (63% of the event-mode step, ablate3.log)
into (a) the threefry key-chain / uniform draws and (b) the
redistribute_u inverse-CDF sampler, plus the step's other RNG users.

Method: monkeypatch _sort_material with variants that keep the state
data-flow intact (so nothing else gets DCE'd) while removing one half:

  full          — production path
  no_redis      — key chain + 12 uniforms drawn, redistribute_u replaced
                  by a trivial bit-mix of the uniforms (isolates RNG cost)
  no_rng        — redistribute_u run on constant uniforms, no key splits
                  (isolates sampler cost)
  neither       — trivial pass-through (matches ablate3's 'minus' row)

Also ablates the key-splitting in _generate_input / _update_accuracy to
see the step's total threefry budget.

CAVEAT (round-3 finding, artifacts/profile_train7.py): wall timings
via jax.block_until_ready are UNRELIABLE on the tunneled TPU client
(early return / ~22 ms poll quantization) and this script also ran
under CPU contention; its absolute numbers are bogus.  Kept for the
ablation STRUCTURE only — use jax.profiler device timelines
(profile_train7.py pattern) for trustworthy sub-ms measurements.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax import lax
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fastb as FB

N_ENVS = 4096
N_STEPS = 256
cfg = load_config(bale_mode="events")
I32, F32 = jnp.int32, jnp.float32


def build_run():
    st = FB.reset_batch(cfg, jax.random.PRNGKey(0), N_ENVS)
    stepped = FB.with_autoreset(cfg, lambda c, s, a: FB.step_mono_rule(c, s))

    def body(st, _):
        st, out = stepped(st, jnp.zeros(N_ENVS, jnp.int32))
        return st, out.reward.sum() + out.obs.sum()

    return jax.jit(lambda s: lax.scan(body, s, None, length=N_STEPS)[1]), st


def t(run, st, reps=3):
    out = run(st)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(st)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


orig_sort = FB._sort_material


def draw_us(st):
    key = st.key
    us = []
    for _ in range(4):
        ks = FB._vsplit(key)
        key, sk = ks[:, 0], ks[:, 1]
        k3 = FB._vsplit(sk, 3)
        us.extend(FB._vuniform(k3[:, j]) for j in range(3))
    return jnp.stack(us), key


def finish(cfg, st, key, leftover, true_arr, false_arr):
    total_input = st.sort_counts.sum(axis=0)
    e_input = leftover.sum(axis=0).astype(I32)
    cont_true = st.cont_true.at[:4].add(true_arr)
    cont_true = cont_true.at[4].add(e_input)
    purity = jnp.where(
        total_input > 0,
        1.0 - (total_input - true_arr.sum(axis=0)).astype(F32)
        / jnp.maximum(total_input, 1).astype(F32), 0.0)
    st = st._replace(cont_true=cont_true,
                     cont_false=st.cont_false + false_arr, key=key)
    return purity, st


def sort_no_redis(cfg, st):
    us, key = draw_us(st)
    # consume the uniforms without the sampler: cheap deterministic mix
    mix = (us.sum(axis=0) * 0.25).astype(I32) % 3          # tiny
    half = (st.sort_counts // 2)
    true_arr = half + mix[None, :] * 0
    false_arr = st.sort_counts - true_arr
    leftover = false_arr // 2
    return finish(cfg, st, key, leftover, true_arr, false_arr)


def sort_no_rng(cfg, st):
    us = jnp.linspace(0.05, 0.95, 12, dtype=F32)[:, None].repeat(N_ENVS, 1)
    leftover, true_arr, false_arr = FB.redistribute_u(
        st.sort_counts, st.acc_sorter, us, FB._support_for(cfg))
    return finish(cfg, st, st.key, leftover, true_arr, false_arr)


def sort_neither(cfg, st):
    half = st.sort_counts // 2
    return finish(cfg, st, st.key, half // 2, half, st.sort_counts - half)


variants = [("full", orig_sort), ("no_redis (RNG only)", sort_no_redis),
            ("no_rng (sampler only)", sort_no_rng), ("neither", sort_neither)]

base = None
for name, fn in variants:
    FB._sort_material = fn
    run, st = build_run()
    dt = t(run, st)
    sps = N_ENVS * N_STEPS / dt
    if base is None:
        base = dt
        print(f"{name:24s}: {sps/1e6:8.2f}M steps/s")
    else:
        print(f"{name:24s}: {sps/1e6:8.2f}M steps/s   saved "
              f"{100*(base-dt)/base:5.1f}% of step time")
FB._sort_material = orig_sort

# total threefry budget: also stub the other two RNG users' key work
orig_ua, orig_gi = FB._update_accuracy, FB._generate_input


def ua_norng(cfg, st):
    base_acc = jnp.asarray(cfg.baseline_accuracy, F32)[:, None]
    return st._replace(acc_belt=jnp.broadcast_to(
        base_acc, st.acc_belt.shape))


def gi_norng(cfg, st):
    bs = cfg.input_batch_size
    switch = st.gen_step_counter >= cfg.steps_per_pattern
    pattern_idx = jnp.where(switch, (st.gen_pattern_idx + 1) % 2,
                            st.gen_pattern_idx)
    step_counter = jnp.where(switch, 0, st.gen_step_counter)
    row = (st.gen_pattern_first + pattern_idx) % 2
    ratios = jnp.where((row == 0)[None, :], FB._P0[:, None], FB._P1[:, None])
    units = jnp.floor(ratios * F32(bs)).astype(I32)
    st = st._replace(gen_pattern_idx=pattern_idx,
                     gen_step_counter=step_counter + 1)
    return units, st


FB._update_accuracy, FB._generate_input = ua_norng, gi_norng
FB._sort_material = sort_no_rng
run, st = build_run()
dt = t(run, st)
print(f"{'zero threefry anywhere':24s}: {N_ENVS*N_STEPS/dt/1e6:8.2f}M "
      f"steps/s   saved {100*(base-dt)/base:5.1f}% of step time")
FB._update_accuracy, FB._generate_input = orig_ua, orig_gi
FB._sort_material = orig_sort
