"""Throughput benchmarks on the production TPU path (BASELINE.json north
star: env-steps/s per chip, Env_3_Monolith, 4096 lockstep instances).

Surfaces, all on the batch-last fast engine (``core.fastb``: f32/i32/
threefry struct-of-arrays with the env batch on the 128-lane axis;
bit-identical trajectories to the vmapped per-env fast engine — the
bit-exact f64 parity engine is CPU-verified by the test suite, this
measures the production path):

1. ``mono_rule``    — closed-loop rule-based monolith step (headline).
                      Headline runs the event-log bale mode
                      (``cfg.bale_mode="events"`` — bitwise-lossless
                      event sourcing of the bale lists,
                      ``core/bale_events.py``); the round-1/2-comparable
                      full-materialization number rides in ``extra``.
2. ``fused_policy`` — Maskable-PPO actor forward (masked argmax) fused
                      with the monolith env step, the
                      ``__graft_entry__.entry()`` shape at 4096 envs.
3. ``train_iter``   — the FULL jitted PPO training iteration
                      (``learn.ppo.make_train_iteration``: rollout scan +
                      GAE + minibatch update epochs) at 4096 envs.
4. ``train_iter_8192`` — the same at 8192 envs (BASELINE config 4 names
                      8192 instances for the learner-attached row).

Timing methodology (round 3): each surface is timed as CHAIN back-to-back
data-dependent dispatches with ONE host sync (a scalar fetch) at the end,
matching how the production loop actually runs (no host sync per
iteration).  ``jax.block_until_ready`` is not used as the fence: on this
tunneled TPU client it quantizes to a ~22 ms completion-poll interval
once any large program has executed (measured in
``artifacts/axon_timing.md``), which both inflates small measurements and
under-reports throughput; a small to-host fetch is a true completion
fence.  Round-2 numbers carried that ~22 ms per timed call and were
conservative.

Prints exactly one JSON line.  The headline metric stays the
round-1-comparable ``env_steps_per_sec_per_chip_mono4096``; the other
surfaces ride in ``extra``.

``--protocol`` additionally times the reference training protocol
(``main.py:47-52``: 3-stage flow, 100k timesteps per stage) end to end —
not run by default to keep the driver bench fast.
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fastb as FB
from marl_sortingenv_tpu.models import mlp

N_ENVS = 4096
N_STEPS = 512
REPEATS = 3
CHAIN = 8
BASELINE = 1_000_000.0  # >=1M env-steps/s/host (BASELINE.json north star)

# learner-attached config: large-minibatch PPO cadence sized for the env
# batch — the minibatch COUNT is held at 16 per epoch (64 grad steps per
# iteration) at every env-batch size, so batch_size scales with the
# rollout (16384 at 4096 envs, 32768 at 8192).  SB3's tiny batch_size=64
# default would serialize ~41k MLP grad steps per iteration, which is a
# CPU-era cadence, not how this learner runs on a TPU; and keeping the
# r3 16384 at 8192 envs doubled the grad-step count for no learning
# benefit (round-4 bisection, artifacts/train_floor_r4.md).
# shuffle_block=128 permutes 128-row blocks of the [T, N]-flattened batch
# (= 128 different env instances at one timestep per block): near-i.i.d.
# samples, full-bandwidth gathers (see PPOConfig.shuffle_block).
TRAIN_N_STEPS = 64
TRAIN_MINIBATCHES = 16  # per epoch; batch_size = n_envs*n_steps/16
TRAIN_EPOCHS = 4
TRAIN_SHUFFLE_BLOCK = 128
# train surfaces chain 16 dispatches per timed repeat (vs 8 for the
# step surfaces): at ~11 ms/iteration the chain edges (first enqueue,
# final fetch) are a measurable fraction of an 8-link chain
TRAIN_CHAIN = 16


def _time_chain(run, carry, work_per_call, chain=CHAIN, repeats=REPEATS):
    """run: carry -> (carry, fence_array).  Times `chain` data-dependent
    dispatches with ONE small to-host fetch as the completion fence;
    returns best work-units/s.  (Buffer donation is deliberately not used:
    the tunneled client rejects fetches from donated executables.)"""
    carry, s = run(carry)  # compile + warmup
    np.asarray(s)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = carry
        for _ in range(chain):
            c, s = run(c)
        np.asarray(s)  # true completion fence (to-host fetch)
        dt = time.perf_counter() - t0
        best = max(best, chain * work_per_call / dt)
        carry = c
    return best


def bench_mono_rule(cfg):
    st = FB.reset_batch(cfg, jax.random.PRNGKey(0), N_ENVS)
    stepped = FB.mono_autoreset_step(cfg, "rule")

    def body(st, _):
        st, out = stepped(st, jnp.zeros(N_ENVS, jnp.int32))
        return st, out.reward.sum()

    run = jax.jit(lambda st: lax.scan(body, st, None, length=N_STEPS))
    return _time_chain(run, st, N_ENVS * N_STEPS)


def bench_mono_rule_long(cfg):
    """The headline surface with ONE 8192-step scan per dispatch instead
    of 8x512: amortizes the tunneled client's ~1.5 ms/call enqueue
    overhead to noise, so this row approximates the DEVICE rate of the
    production step (round-4 local: 212.3M vs 183.6M at scan 512 —
    long-running rollouts see this rate)."""
    st = FB.reset_batch(cfg, jax.random.PRNGKey(0), N_ENVS)
    stepped = FB.mono_autoreset_step(cfg, "rule")

    def body(st, _):
        st, out = stepped(st, jnp.zeros(N_ENVS, jnp.int32))
        return st, out.reward.sum()

    long_steps = 8192
    run = jax.jit(lambda st: lax.scan(body, st, None, length=long_steps))
    return _time_chain(run, st, N_ENVS * long_steps, chain=1)


def bench_sharded_mono_rule(cfg):
    """The multi-chip production path on however many devices are
    attached (one chip in this environment): the fastb env step under
    ``jax.shard_map`` over a ('dp','tp') mesh
    (``parallel.fastb_shard.shard_step`` — the Pallas sort kernel runs
    per shard).  On a 1-device mesh this measures the sharded program
    shape's overhead vs the unsharded headline row; sharded ==
    unsharded is asserted bitwise in tests/test_sharding.py."""
    from marl_sortingenv_tpu.parallel import fastb_shard as FS
    from marl_sortingenv_tpu.parallel import mesh as M

    mesh = M.make_mesh(tp=1)
    st = FS.shard_bstate(
        mesh, FB.reset_batch(cfg, jax.random.PRNGKey(0), N_ENVS))
    stepped = FS.shard_step(mesh, FB.mono_autoreset_step(cfg, "rule"), st)

    def body(st, _):
        st, out = stepped(st, jnp.zeros(N_ENVS, jnp.int32))
        return st, out.reward.sum()

    run = jax.jit(lambda st: lax.scan(body, st, None, length=N_STEPS))
    return _time_chain(run, st, N_ENVS * N_STEPS)


def assert_sort_kernel_bitwise(cfg):
    """Re-certify the fused Pallas sort kernel's bitwise-identity claim
    on the real chip in EVERY driver capture (VERDICT r3 missing #3 —
    a Mosaic/compiler update could silently break it; the frozen
    artifacts/sort_pallas_ab.log only proves 2026-08-20's toolchain).
    One _sort_material draw on a stepped 4096-env state: the XLA draw
    chain + redistribute_u vs the fused kernel, asserted equal bit for
    bit (including the advanced keys).  ~1 s."""
    if jax.default_backend() != "tpu":
        return f"skipped (backend={jax.default_backend()})"
    from marl_sortingenv_tpu.ops import sort_pallas as SP

    st = FB.reset_batch(cfg, jax.random.PRNGKey(7), 4096)
    stepped = jax.jit(
        FB.with_autoreset(cfg, lambda c, s, a: FB.step_mono_rule(c, s)))
    for _ in range(5):
        st, _ = stepped(st, jnp.zeros(4096, jnp.int32))
    support = FB._support_for(cfg)

    @jax.jit
    def xla_path(st):
        key = st.key
        us = []
        for _ in range(4):
            ks = FB._vsplit(key)
            key, sk = ks[:, 0], ks[:, 1]
            k3 = FB._vsplit(sk, 3)
            us.extend(FB._vuniform(k3[:, j]) for j in range(3))
        lo, t, f = FB.redistribute_u(st.sort_counts, st.acc_sorter,
                                     jnp.stack(us), support)
        return lo, t, f, key

    lo_x, t_x, f_x, k_x = xla_path(st)
    lo_p, t_p, f_p, k_p = SP.sort_material_fused(
        st.sort_counts, st.acc_sorter, st.key, support=support)
    pairs = [(lo_x, lo_p), (t_x, t_p), (f_x, f_p), (k_x, k_p)]
    if not all(bool(jnp.array_equal(a, b)) for a, b in pairs):
        raise AssertionError(
            "Pallas sort kernel diverged bitwise from the XLA path on "
            "this chip/toolchain — do not trust kernel-path numbers")
    return "PASS"


def assert_step_kernel_bitwise(cfg):
    """Per-capture re-certification of the FULL-STEP kernel
    (ops/step_pallas.py, round 4): one monolith step on a stepped
    4096-env state, XLA vs fused kernel, every state leaf and output
    asserted bit-equal on the chip this capture ran on."""
    if jax.default_backend() != "tpu":
        return f"skipped (backend={jax.default_backend()})"
    from marl_sortingenv_tpu.ops import step_pallas as SPK

    cfg_x = cfg.with_(step_kernel="xla")
    st = FB.reset_batch(cfg_x, jax.random.PRNGKey(9), 4096)
    stepped = jax.jit(
        FB.with_autoreset(cfg_x, lambda c, s, a: FB.step_mono_rule(c, s)))
    for _ in range(5):
        st, _ = stepped(st, jnp.zeros(4096, jnp.int32))
    st_x, out_x = jax.jit(lambda s: FB.step_mono_rule(cfg_x, s))(st)
    st_p, out_p = jax.jit(lambda s: SPK.step_mono(
        cfg, s, None, variant="rule",
        support=FB._support_for(cfg)))(st)
    for nm, a, b in zip(FB.BState._fields, st_x, st_p):
        if a is not None and not bool(jnp.array_equal(a, b)):
            raise AssertionError(f"step kernel diverged on state.{nm}")
    for nm in FB.BStepOut._fields:
        if not bool(jnp.array_equal(getattr(out_x, nm),
                                    getattr(out_p, nm))):
            raise AssertionError(f"step kernel diverged on out.{nm}")

    # Trajectory A/B (ADVICE r4): 640 autoreset steps cross dozens of
    # press completions (timers 12/15 -> the event-append branch) AND
    # the max_steps=600 episode boundary (the fused-autoreset branch) —
    # branches a 1-step assert never reaches.  Final state + summed
    # rewards asserted bit-equal, and the branch crossings are proven,
    # not assumed.
    traj = 640

    def mk(c):
        stepped = FB.mono_autoreset_step(c, "rule")

        def body(s, _):
            s, out = stepped(s, jnp.zeros(4096, jnp.int32))
            return s, out.reward.sum()

        return jax.jit(lambda s: lax.scan(body, s, None, length=traj))

    st0 = FB.reset_batch(cfg_x, jax.random.PRNGKey(11), 4096)
    fs_x, rew_x = mk(cfg_x)(st0)
    fs_p, rew_p = mk(cfg)(st0)
    for nm, a, b in zip(FB.BState._fields, fs_x, fs_p):
        if a is not None and not bool(jnp.array_equal(a, b)):
            raise AssertionError(
                f"step kernel diverged on trajectory state.{nm}")
    if not bool(jnp.array_equal(rew_x, rew_p)):
        raise AssertionError("step kernel diverged on trajectory rewards")
    if int(jnp.max(fs_p.ev_cnt)) <= 0:
        raise AssertionError("trajectory A/B crossed no press completion")
    if int(jnp.max(fs_p.current_step)) >= traj:
        raise AssertionError("trajectory A/B crossed no episode boundary")
    return "PASS"


def bench_sort_env(cfg):
    """Env_1_Sorting at benchmark scale (BASELINE configs 1-3 name the
    sort/press surfaces): external 2-way sort actions drawn on-device,
    the env's masked random press + autoreset fused into the full-step
    kernel (round 5)."""
    st = FB.reset_batch(cfg, jax.random.PRNGKey(2), N_ENVS)
    stepped = FB.mono_autoreset_step(cfg, "sort")

    def body(carry, _):
        st, key = carry
        key, sk = jax.random.split(key)
        a = jax.random.bernoulli(
            sk, jnp.float32(0.5), (N_ENVS,)).astype(jnp.int32)
        st, out = stepped(st, a)
        return (st, key), out.reward.sum()

    run = jax.jit(lambda c: lax.scan(body, c, None, length=N_STEPS))
    return _time_chain(run, (st, jax.random.PRNGKey(3)), N_ENVS * N_STEPS)


def bench_press_env(cfg):
    """Env_2_Pressing at benchmark scale: masked-uniform press actions
    drawn on-device (a representative always-valid policy), rule-based
    sort mode inside the step, autoreset fused into the kernel."""
    st = FB.reset_batch(cfg, jax.random.PRNGKey(4), N_ENVS)
    stepped = FB.mono_autoreset_step(cfg, "press")

    def body(carry, _):
        st, key = carry
        key, sk = jax.random.split(key)
        mask = FB.press_action_masks(cfg, st)
        u = jax.random.uniform(sk, (N_ENVS,), jnp.float32)
        a = FB.masked_uniform_choice(mask, u)
        st, out = stepped(st, a)
        return (st, key), out.reward.sum()

    run = jax.jit(lambda c: lax.scan(body, c, None, length=N_STEPS))
    return _time_chain(run, (st, jax.random.PRNGKey(5)), N_ENVS * N_STEPS)


def assert_variant_kernels_bitwise(cfg):
    """On-chip A/B for the round-5 sort/press kernel variants: 24
    autoreset steps (max_steps=20 -> crosses an episode boundary; the
    default press times tick and, at balesize 200, presses start) on a
    4096-env state, kernel vs forced-XLA, all state leaves + outputs
    bit-equal."""
    if jax.default_backend() != "tpu":
        return f"skipped (backend={jax.default_backend()})"
    res = {}
    for variant, na in (("sort", 2), ("press", 11)):
        c = cfg.with_(max_steps=20)
        cx = c.with_(step_kernel="xla")
        rng = np.random.default_rng(31)
        acts = jnp.asarray(rng.integers(0, na, size=(24, 4096)), jnp.int32)

        def roll(cc):
            stepped = FB.mono_autoreset_step(cc, variant)

            def body(st, a):
                st, out = stepped(st, a)
                # obs compared ELEMENTWISE: a cross-program .sum() would
                # compare XLA reduction orders, not the kernel
                return st, (out.reward, out.obs)

            st0 = FB.reset_batch(cc, jax.random.PRNGKey(41), 4096)
            return jax.jit(lambda s: lax.scan(body, s, acts))(st0)

        st_x, (rew_x, obs_x) = roll(cx)
        st_p, (rew_p, obs_p) = roll(c)
        for nm, a, b in zip(FB.BState._fields, st_x, st_p):
            if a is not None and not bool(jnp.array_equal(a, b)):
                raise AssertionError(
                    f"{variant} kernel diverged on state.{nm}")
        if not (bool(jnp.array_equal(rew_x, rew_p))
                and bool(jnp.array_equal(obs_x, obs_p))):
            raise AssertionError(f"{variant} kernel diverged on outputs")
        res[variant] = "PASS"
    return f"sort:{res['sort']} press:{res['press']}"


def bench_fused_policy(cfg):
    """entry() shape at benchmark scale: masked argmax policy + env step,
    autoreset, one jitted scan."""
    params = mlp.init_params(jax.random.PRNGKey(0), obs_dim=29, n_actions=22)
    st = FB.reset_batch(cfg, jax.random.PRNGKey(1), N_ENVS)
    stepped = FB.mono_autoreset_step(cfg, "external", True)

    def body(carry, _):
        st, obs = carry
        masks = FB.monolith_action_masks(cfg, st)
        logits = mlp.masked_logits(mlp.policy_logits(params, obs), masks)
        actions = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        st, out = stepped(st, actions)
        return (st, out.obs), out.reward.sum()

    obs0 = FB.get_mono_obs(cfg, st)
    run = jax.jit(lambda c: lax.scan(body, c, None, length=N_STEPS))
    return _time_chain(run, (st, obs0), N_ENVS * N_STEPS)


def _train_pcfg(n_envs):
    from marl_sortingenv_tpu.learn import ppo

    return ppo.PPOConfig(
        n_steps=TRAIN_N_STEPS,
        batch_size=n_envs * TRAIN_N_STEPS // TRAIN_MINIBATCHES,
        n_epochs=TRAIN_EPOCHS,
        shuffle_block=TRAIN_SHUFFLE_BLOCK)


def bench_train_iteration(cfg, n_envs):
    """Full PPO iteration (rollout + GAE + update) throughput, chained
    per-iteration dispatch — the trainer's dispatch mode at this scale
    (learn.trainer.SEGMENT_MAX_ENVS)."""
    from marl_sortingenv_tpu.learn import ppo

    pcfg = _train_pcfg(n_envs)
    spec = ppo.spec_for("mono", engine="fastb")
    ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=n_envs, seed=0)
    it = ppo.make_train_iteration(cfg, pcfg, spec)

    def run(ts):
        ts, stats = it(ts)
        return ts, stats["loss"]

    steps_per_iter = n_envs * TRAIN_N_STEPS
    sps = _time_chain(run, ts, steps_per_iter, chain=TRAIN_CHAIN)
    return sps, sps / steps_per_iter


def bench_train_run(cfg, n_envs, seg=8, seg_unroll=1):
    """The segmented training-loop shape: `seg` PPO iterations per
    jitted lax.scan dispatch (ppo.make_train_run).  This is what the
    trainer dispatches BELOW trainer.SEGMENT_MAX_ENVS (protocol-scale
    shapes, where the ~1.7 ms/call dispatch gap dominates); at the
    bench's 4096/8192-env shapes the ROLLED (unroll=1) segment costs
    ~3 ms/iter MORE device time than the standalone iteration (the
    while-loop body re-materializes the transition buffers every trip —
    artifacts/train_floor_r4.md), which is why the trainer picks
    per-iteration dispatch here.  ``seg_unroll=seg`` removes the
    while-loop entirely and recovers 100% of that gap (round 5,
    artifacts/train_run_gap_r5.md: u8 matches train_iter at both 4096
    and 8192; partial unrolls don't help).  Both variants stay as bench
    surfaces so the crossover and the recovery stay measured."""
    from marl_sortingenv_tpu.learn import ppo

    pcfg = _train_pcfg(n_envs)
    spec = ppo.spec_for("mono", engine="fastb")
    ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=n_envs, seed=0)
    it = ppo.make_train_run(cfg, pcfg, spec, seg, seg_unroll=seg_unroll)

    def run(ts):
        ts, stats = it(ts)
        return ts, stats["loss"][-1]

    steps_per_call = n_envs * TRAIN_N_STEPS * seg
    sps = _time_chain(run, ts, steps_per_call, chain=2)
    return sps, sps / (n_envs * TRAIN_N_STEPS)


def bench_protocol(cfg):
    """Wall-clock for the reference training protocol: 3-stage flow
    (sort -> press[frozen sort] -> mono), 100k timesteps each
    (reference main.py:47-52; the reference's CPU SB3 takes minutes per
    stage).  The flow's closing 5-policy benchmark is excluded — it runs
    on the f64 parity engine, which is CPU territory."""
    from marl_sortingenv_tpu.learn import trainer

    t0 = time.perf_counter()
    sort_res = trainer.train_agent(
        cfg, "sort", 100_000, n_envs=16, use_action_masking=True,
        models_dir="/tmp/bench_models", verbose=False)
    trainer.train_agent(
        cfg, "press", 100_000, n_envs=16, use_action_masking=True,
        sort_params=sort_res.params, models_dir="/tmp/bench_models",
        verbose=False)
    trainer.train_agent(
        cfg, "mono", 100_000, n_envs=16, use_action_masking=True,
        models_dir="/tmp/bench_models", verbose=False)
    return time.perf_counter() - t0


def main():
    # Production config: event-log bale mode (cfg.bale_mode="events") —
    # finished presses append one (material, amount, quality) event to a
    # compact (E, N) log instead of rewriting the (5, MAX_BALES, N) bale
    # ring buffers every step.  Bitwise-lossless (the exact bale lists are
    # a deterministic host replay, tests/test_bale_events.py) and removes
    # the dominant HBM write traffic of the step: +56% measured
    # (artifacts/bale_events_ab.log).  The full-materialization row is
    # kept in `extra` for comparability with rounds 1-2.
    cfg = load_config(bale_mode="events")
    kernel_ab = assert_sort_kernel_bitwise(cfg)
    step_ab = assert_step_kernel_bitwise(cfg)
    var_ab = assert_variant_kernels_bitwise(cfg)
    rule = bench_mono_rule(cfg)
    sort_env = bench_sort_env(cfg)
    press_env = bench_press_env(cfg)
    rule_long = bench_mono_rule_long(cfg)
    rule_full = bench_mono_rule(load_config(bale_mode="full"))
    sharded = bench_sharded_mono_rule(cfg)
    fused = bench_fused_policy(cfg)
    train_sps, train_ups = bench_train_iteration(cfg, N_ENVS)
    train8_sps, train8_ups = bench_train_iteration(cfg, 2 * N_ENVS)
    trun_sps, trun_ups = bench_train_run(cfg, N_ENVS)
    trun8_sps, trun8_ups = bench_train_run(cfg, 2 * N_ENVS)
    trunu8_sps, _ = bench_train_run(cfg, 2 * N_ENVS, seg_unroll=8)

    extra = {
        "sort_kernel_bitwise_ab": kernel_ab,
        "step_kernel_bitwise_ab": step_ab,
        "variant_kernels_bitwise_ab": var_ab,
        "sort_env_steps_per_sec": round(sort_env, 1),
        "press_env_steps_per_sec": round(press_env, 1),
        "mono_rule_scan8192_env_steps_per_sec": round(rule_long, 1),
        "sharded_mono_rule_env_steps_per_sec": round(sharded, 1),
        "mono_rule_full_bale_env_steps_per_sec": round(rule_full, 1),
        "fused_policy_env_steps_per_sec": round(fused, 1),
        "train_iter_env_steps_per_sec": round(train_sps, 1),
        "train_iter_updates_per_sec": round(train_ups, 4),
        "train_iter_8192_env_steps_per_sec": round(train8_sps, 1),
        "train_iter_8192_updates_per_sec": round(train8_ups, 4),
        "train_run_env_steps_per_sec": round(trun_sps, 1),
        "train_run_updates_per_sec": round(trun_ups, 4),
        "train_run_8192_env_steps_per_sec": round(trun8_sps, 1),
        "train_run_8192_updates_per_sec": round(trun8_ups, 4),
        "train_run_8192_unrolled_env_steps_per_sec": round(trunu8_sps, 1),
        "train_iter_config": {
            "n_envs": N_ENVS, "n_steps": TRAIN_N_STEPS,
            "batch_size": _train_pcfg(N_ENVS).batch_size,
            "batch_size_8192": _train_pcfg(2 * N_ENVS).batch_size,
            "n_epochs": TRAIN_EPOCHS,
            "shuffle_block": TRAIN_SHUFFLE_BLOCK,
            "chain": TRAIN_CHAIN},
    }
    if "--protocol" in sys.argv:
        # default config (bale_mode="auto" -> events on fastb since r5)
        # — the drop-in user's configuration
        extra["protocol_3stage_100k_wall_s"] = round(
            bench_protocol(load_config()), 1)

    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip_mono4096",
        "value": round(rule, 1),
        "unit": "env_steps_per_sec",
        "vs_baseline": round(rule / BASELINE, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    sys.exit(main())
