"""Batch-last (struct-of-arrays) fast TPU engine.

Same dynamics and the SAME per-instance RNG stream structure as
``core.fast`` (the per-env engine batched via ``vmap``), but with the
env batch stored on the LAST axis of every state leaf: counts are
``i32[4, N]``, containers ``i32[5, N]``, bales ``i16[5, MAX, N]`` etc.

Why: under ``vmap`` the per-env engine's state leaves are batch-first
``(N, 4)`` / ``(N, 5)`` / ``(N, 2)``.  XLA:TPU tiles the two minor
dimensions as (8 sublanes, 128 lanes), so a ``(N, 4)`` f32 intermediate
pads 4 -> 128 lanes and every fusion-boundary round-trip to HBM moves
32x more bytes than the data holds.  With the batch on lanes the same
intermediates are fully packed; measured on one v5e chip this takes the
4096-env monolith from ~5.3M to a substantially higher env-steps/s (see
bench.py output and tests/test_fastb.py).

Equivalence: every ``jax.random`` call is the per-env call of
``core.fast`` mapped over the key batch, so for matching seeds the two
engines produce BIT-IDENTICAL trajectories (asserted leaf-by-leaf in
tests/test_fastb.py on CPU).  Reference behavior citations live in
``core.fast`` / ``core.step``; this module mirrors fast.py one function
at a time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config.config import SimConfig

I32 = jnp.int32
I16 = jnp.int16
F32 = jnp.float32

_P0 = jnp.array([0.40, 0.15, 0.35, 0.10], F32)
_P1 = jnp.array([0.15, 0.40, 0.10, 0.35], F32)

_HG_SUPPORT = 104  # worst-case cap (= core.fast._HG_SUPPORT)


def _support_for(cfg: SimConfig) -> int:
    """Static (trace-time) support bound for one hypergeometric draw.

    Every draw in the redistribution is n = false_val of one station,
    where false_val = target - rint(target*acc) <= target*(1-acc) + 0.5,
    acc >= min(baseline_accuracy) - noise (boost only raises it), and
    target <= floor(max_pattern_ratio * batch) + remainder_units.
    Shrinking the pmf support to this bound leaves the sampled value
    BIT-IDENTICAL (the Hillis-Steele prefix for lane k only reads lanes
    <= k, and lanes past ``hi`` carry zero probability), while cutting
    the scan work ~(104/S)x — the sampler dominates the step.
    """
    bs = cfg.input_batch_size
    max_target = int(0.40 * bs) + 4
    min_acc = max(0.0, min(cfg.baseline_accuracy) - cfg.effective_noise)
    max_false = int(max_target * (1.0 - min_acc) + 0.5) + 1
    s = max(8, -(-(max_false + 2) // 8) * 8)
    if s > _HG_SUPPORT:
        raise ValueError(
            f"hypergeometric support {s} exceeds the engine cap "
            f"{_HG_SUPPORT}: config (input_batch_size="
            f"{cfg.input_batch_size}, min baseline_accuracy - noise = "
            f"{min_acc:.3f}) is outside the fast engines' sampling "
            "domain; truncating the pmf would silently corrupt the "
            "distribution")
    return s


class BState(NamedTuple):
    """core.fast.FastEnvState with the env batch on the last axis."""
    input_counts: jax.Array   # i32[4, N]
    belt_counts: jax.Array    # i32[4, N]
    sort_counts: jax.Array    # i32[4, N]
    acc_belt: jax.Array       # f32[4, N]
    acc_sorter: jax.Array     # f32[4, N]
    sensor_setting: jax.Array  # i32[N]
    input_occupancy: jax.Array  # f32[N]
    belt_occupancy: jax.Array   # f32[N]
    cont_true: jax.Array      # i32[5, N]
    cont_false: jax.Array     # i32[4, N]
    press_timer: jax.Array    # i32[2, N]
    press_mat: jax.Array      # i32[2, N]
    press_n: jax.Array        # i32[2, N]
    press_q: jax.Array        # f32[2, N]
    bale_size: jax.Array      # i16[5, MAX, N]
    bale_qual: jax.Array      # i16[5, MAX, N]
    bale_cnt: jax.Array       # i32[5, N]
    last_press_started: jax.Array  # bool[N]
    last_press_amount: jax.Array   # i32[N]
    gen_pattern_first: jax.Array   # i32[N]
    gen_pattern_idx: jax.Array     # i32[N]
    gen_step_counter: jax.Array    # i32[N]
    current_step: jax.Array        # i32[N]
    total_input_units: jax.Array   # i32[N]
    key: jax.Array                 # u32[N, 2] threefry keys
    # Event-log bale mode (cfg.bale_mode == "events"): bale_size/qual/cnt
    # above are None and each finished press appends one event here; the
    # exact bale lists are rebuilt on host by core.bale_events.  In
    # "full" mode these four leaves are None instead.
    ev_mat: jax.Array | None = None   # i16[E, N]
    ev_n: jax.Array | None = None     # i16[E, N]
    ev_q: jax.Array | None = None     # i16[E, N] (integer percent)
    ev_cnt: jax.Array | None = None   # i32[N]


class BStepOut(NamedTuple):
    obs: jax.Array          # f32[N, obs_dim]
    reward: jax.Array       # f32[N]
    terminated: jax.Array   # bool[N]
    action: jax.Array       # i32[N]
    sort_reward: jax.Array  # f32[N]
    press_reward: jax.Array  # f32[N]
    purity: jax.Array       # f32[N]


def _select_state(pred, a: "BState", b: "BState") -> "BState":
    """Per-env select over whole states: b where pred else a.

    ``key`` is batch-FIRST (N, 2); every other leaf batch-last; ``None``
    leaves (the unused bale representation of the current mode) pass
    through."""
    sel = {}
    for name, x, y in zip(BState._fields, a, b):
        if x is None:
            sel[name] = None
        elif name == "key":
            sel[name] = jnp.where(pred[:, None], y, x)
        else:
            sel[name] = _bwhere(pred, y, x)
    return BState(**sel)


def _bwhere(cond, a, b):
    """jnp.where with a batch-(N,) cond broadcast over LEADING axes."""
    c = cond.reshape((1,) * (a.ndim - 1) + (-1,))
    return jnp.where(c, a, b)


# ---------------------------------------------------------------------------
# Batched RNG primitives (each is the per-env core.fast call under vmap,
# preserving bit-identical streams)
# ---------------------------------------------------------------------------

def _vsplit(keys, num=2):
    return jax.vmap(lambda k: jax.random.split(k, num))(keys)  # (N,num,2)


def _vuniform(keys, dtype=F32):
    return jax.vmap(lambda k: jax.random.uniform(k, dtype=dtype))(keys)


def _vuniform4(keys, lo, hi):
    return jax.vmap(lambda k: jax.random.uniform(k, (4,), F32, lo, hi),
                    out_axes=1)(keys)            # (4, N)


def _vrandint4(keys, lo, hi):
    # dtype pinned i32: x64-invariant draw (the engine is an i32 engine)
    return jax.vmap(lambda k: jax.random.randint(k, (4,), lo, hi, I32),
                    out_axes=1)(keys)            # (4, N)


def _vbernoulli(keys):
    # f32 p: x64-invariant draw (see core.fast reset comment)
    return jax.vmap(
        lambda k: jax.random.bernoulli(k, jnp.float32(0.5)))(keys)  # (N,)


def _vcategorical(keys, logits_nm):
    return jax.vmap(jax.random.categorical)(keys, logits_nm)  # (N,)


# ---------------------------------------------------------------------------
# Reset
# ---------------------------------------------------------------------------

def resolved_bale_mode(cfg: SimConfig) -> str:
    """This engine's reading of ``cfg.bale_mode``: "auto" resolves to
    "events" (the production path — the fused step kernel requires it
    and it removes the dominant HBM write traffic); engines without an
    event mode ignore bale_mode entirely, so "auto" costs them nothing."""
    m = getattr(cfg, "bale_mode", "full")
    return "events" if m in ("auto", "events") else "full"


def _bale_zeros(cfg: SimConfig, n: int) -> dict:
    if resolved_bale_mode(cfg) == "events":
        e = cfg.max_press_events
        # Guard the IMPLICIT default path only: users who were silently
        # routed to events by bale_mode="auto" must not overflow the log
        # (SimConfig built directly, bypassing load_config's automatic
        # sizing).  Explicit bale_mode="events" configs may legitimately
        # bound E below the worst case when they run fewer steps —
        # core.bale_events.rebuild_bales still hard-fails on overflow.
        if getattr(cfg, "bale_mode", "full") == "auto":
            needed = (cfg.max_steps // max(1, cfg.press_time_1)
                      + cfg.max_steps // max(1, cfg.press_time_2))
            if e < needed:
                raise ValueError(
                    f"max_press_events={e} cannot hold the {needed} press "
                    f"completions a max_steps={cfg.max_steps} episode can "
                    "produce — build the config via load_config() (which "
                    "sizes it automatically), raise max_press_events, or "
                    "set bale_mode explicitly")
        return dict(bale_size=None, bale_qual=None, bale_cnt=None,
                    ev_mat=jnp.zeros((e, n), I16),
                    ev_n=jnp.zeros((e, n), I16),
                    ev_q=jnp.zeros((e, n), I16),
                    ev_cnt=jnp.zeros(n, I32))
    return dict(bale_size=jnp.zeros((5, cfg.max_bales, n), I16),
                bale_qual=jnp.zeros((5, cfg.max_bales, n), I16),
                bale_cnt=jnp.zeros((5, n), I32))


def _reset_from_keys(cfg: SimConfig, keys) -> BState:
    n = keys.shape[0]
    ks = _vsplit(keys)
    key, k1 = ks[:, 0], ks[:, 1]
    first = _vbernoulli(k1).astype(I32)

    z4 = jnp.zeros((4, n), I32)
    acc0 = jnp.broadcast_to(
        jnp.asarray(cfg.baseline_accuracy, F32)[:, None], (4, n))
    return BState(
        input_counts=z4,
        belt_counts=z4,
        sort_counts=z4,
        acc_belt=acc0,
        acc_sorter=acc0,
        sensor_setting=jnp.zeros(n, I32),
        input_occupancy=jnp.zeros(n, F32),
        belt_occupancy=jnp.zeros(n, F32),
        cont_true=jnp.zeros((5, n), I32),
        cont_false=z4,
        press_timer=jnp.zeros((2, n), I32),
        press_mat=jnp.zeros((2, n), I32),
        press_n=jnp.zeros((2, n), I32),
        press_q=jnp.zeros((2, n), F32),
        **(_bale_zeros(cfg, n)),
        last_press_started=jnp.zeros(n, bool),
        last_press_amount=jnp.zeros(n, I32),
        gen_pattern_first=first,
        gen_pattern_idx=jnp.zeros(n, I32),
        gen_step_counter=jnp.zeros(n, I32),
        current_step=jnp.zeros(n, I32),
        total_input_units=jnp.zeros(n, I32),
        key=key,
    )


def reset_batch(cfg: SimConfig, key, n: int) -> BState:
    return _reset_from_keys(cfg, jax.random.split(key, n))


def from_batch_first(st_bf) -> BState:
    """Convert a vmapped core.fast.FastEnvState (batch axis 0) to BState."""
    kw = {name: (x if (name == "key" or x.ndim <= 1)
                 else jnp.moveaxis(x, 0, -1))     # key stays (N, 2)
          for name, x in zip(type(st_bf)._fields, st_bf)}
    return BState(**kw)


def to_batch_first(st: BState):
    from . import fast as FE
    if st.ev_cnt is not None:
        raise ValueError(
            "to_batch_first needs a full-bale-mode state; convert with "
            "core.bale_events.events_to_full(cfg, st) first")
    kw = {name: (x if (name == "key" or x.ndim <= 1)
                 else jnp.moveaxis(x, -1, 0))
          for name, x in zip(BState._fields, st) if not name.startswith("ev_")}
    return FE.FastEnvState(**kw)


# ---------------------------------------------------------------------------
# Sampling helpers
# ---------------------------------------------------------------------------

def _prefix_sum0(x):
    """Inclusive prefix sum along axis 0 (support axis) — Hillis-Steele."""
    idx = lax.broadcasted_iota(I32, x.shape, 0)
    s = 1
    while s < x.shape[0]:
        x = x + jnp.where(idx >= s, jnp.roll(x, s, axis=0), 0.0)
        s *= 2
    return x


def _prefix_prod0(x):
    idx = lax.broadcasted_iota(I32, x.shape, 0)
    s = 1
    while s < x.shape[0]:
        x = x * jnp.where(idx >= s, jnp.roll(x, s, axis=0), 1.0)
        s *= 2
    return x


def _hypergeom(keys, N, K, n, support=_HG_SUPPORT):
    """Batched X ~ Hypergeometric(N, K, n); all of N/K/n are i32[B].

    Same product-space inverse-CDF as core.fast._hypergeom, pmf laid out
    (support, batch) so the batch rides the 128-lane axis.  ``support``
    must statically bound hi = min(K, n) (see _support_for)."""
    return _hypergeom_u(_vuniform(keys), N, K, n, support)


def _hypergeom_u(u, N, K, n, support=_HG_SUPPORT):
    """_hypergeom with the uniform u: f32[B] in [0,1) supplied by the
    caller — the shared core between the XLA path (uniforms from
    threefry keys) and the Pallas kernel equivalence test
    (ops/mvhg_pallas.py consumes the same pre-drawn uniforms)."""
    Nf = jnp.maximum(N, 1).astype(F32)[None, :]
    ks = lax.broadcasted_iota(I32, (support, 1), 0)
    kf = ks.astype(F32)
    Kf = K.astype(F32)[None, :]
    nf = n.astype(F32)[None, :]
    lo = jnp.maximum(0, n - (N - K))
    hi = jnp.minimum(K, n)
    num = (Kf - kf) * (nf - kf)
    den = (kf + 1.0) * (Nf - Kf - nf + kf + 1.0)
    in_band = (ks >= lo[None, :]) & (ks < hi[None, :])
    ratio = jnp.where(in_band, num / den, 1.0)
    pp = _prefix_prod0(ratio)
    pmf = jnp.concatenate([jnp.ones((1, pp.shape[1]), F32), pp[:-1]], axis=0)
    valid = (ks >= lo[None, :]) & (ks <= hi[None, :])
    pmf = jnp.where(valid, pmf, 0.0)
    cdf = _prefix_sum0(pmf)
    us = u * cdf[-1]
    x = jnp.sum((cdf < us[None, :]).astype(I32), axis=0)
    return jnp.clip(x, lo, hi)


def _mvhg4(keys, counts, n, support=_HG_SUPPORT):
    """Batched multivariate hypergeometric over 4 categories.
    counts: i32[4, B]; n: i32[B] -> removed i32[4, B]."""
    ks = _vsplit(keys, 3)
    us = jnp.stack([_vuniform(ks[:, j]) for j in range(3)])
    return _mvhg4_u(us, counts, n, support)


def _mvhg4_u(us, counts, n, support=_HG_SUPPORT):
    """_mvhg4 with the three uniforms us: f32[3, B] supplied."""
    N = counts.sum(axis=0)
    n = jnp.minimum(n, N)
    d0 = _hypergeom_u(us[0], N, counts[0], n, support)
    N1 = N - counts[0]
    n1 = n - d0
    d1 = _hypergeom_u(us[1], N1, counts[1], n1, support)
    N2 = N1 - counts[1]
    n2 = n1 - d1
    d2 = _hypergeom_u(us[2], N2, counts[2], n2, support)
    d3 = n2 - d2
    return jnp.stack([d0, d1, d2, d3]).astype(I32)


def redistribute_u(counts, acc_sorter, us, support=_HG_SUPPORT):
    """The redistribution core of ``_sort_material`` consuming pre-drawn
    uniforms ``us: f32[12, B]`` (3 conditional draws x 4 stations, in
    station-major order — the Pallas kernel's layout,
    ops/mvhg_pallas.py).  counts/acc_sorter are (4, B).  Returns
    (leftover, true_arr, false_arr), each i32[4, B].

    This IS the production path (called by _sort_material with uniforms
    drawn from the key chain) and the oracle for the kernel equivalence
    test — they cannot drift apart."""
    leftover = counts
    true_arr = jnp.zeros_like(counts)
    false_arr = jnp.zeros_like(counts)
    for i in range(4):
        target = leftover[i]
        true_val = jnp.rint(target.astype(F32) * acc_sorter[i]).astype(I32)
        false_val = target - true_val
        true_arr = true_arr.at[i].set(true_val)
        false_arr = false_arr.at[i].set(false_val)
        leftover = leftover.at[i].set(false_val)
        removed = _mvhg4_u(us[3 * i:3 * i + 3], leftover, false_val, support)
        leftover = leftover - removed
    return leftover, true_arr, false_arr


# ---------------------------------------------------------------------------
# Plant dynamics
# ---------------------------------------------------------------------------

def _generate_input(cfg: SimConfig, st: BState):
    bs = cfg.input_batch_size
    switch = st.gen_step_counter >= cfg.steps_per_pattern
    pattern_idx = jnp.where(switch, (st.gen_pattern_idx + 1) % 2,
                            st.gen_pattern_idx)
    step_counter = jnp.where(switch, 0, st.gen_step_counter)
    row = (st.gen_pattern_first + pattern_idx) % 2
    ratios = jnp.where((row == 0)[None, :], _P0[:, None], _P1[:, None])
    units = jnp.floor(ratios * F32(bs)).astype(I32)       # (4, N)
    remainder = I32(bs) - units.sum(axis=0)               # (N,)

    ks = _vsplit(st.key)
    key, k1 = ks[:, 0], ks[:, 1]
    ms = _vrandint4(k1, 0, 4)                             # (4, N) draws
    active = lax.broadcasted_iota(I32, (4, 1), 0) < remainder[None, :]
    cats = lax.broadcasted_iota(I32, (4, 1, 1), 0)        # category axis
    add = ((ms[None, :, :] == cats) & active[None, :, :]).sum(axis=1)
    units = units + add.astype(I32)
    st = st._replace(
        gen_pattern_idx=pattern_idx,
        gen_step_counter=step_counter + 1,
        key=key,
    )
    return units, st


def _update_environment(cfg: SimConfig, st: BState) -> BState:
    st = st._replace(
        sort_counts=st.belt_counts,
        belt_counts=st.input_counts,
        belt_occupancy=st.input_occupancy,
    )
    counts, st = _generate_input(cfg, st)
    return st._replace(
        input_counts=counts,
        input_occupancy=counts.sum(axis=0).astype(F32) / 100.0,
        acc_sorter=st.acc_belt,
        total_input_units=(st.total_input_units
                           + counts.sum(axis=0)).astype(I32),
    )


def _update_accuracy(cfg: SimConfig, st: BState) -> BState:
    base = jnp.asarray(cfg.baseline_accuracy, F32)[:, None]
    boost_ac = jnp.array([cfg.boost, 0.0, cfg.boost, 0.0], F32)[:, None]
    boost_bd = jnp.array([0.0, cfg.boost, 0.0, cfg.boost], F32)[:, None]
    ss = st.sensor_setting[None, :]
    acc = base + jnp.where(ss == 0, boost_ac,
                           jnp.where(ss == 1, boost_bd, 0.0))
    ks = _vsplit(st.key)
    key, k1 = ks[:, 0], ks[:, 1]
    n = cfg.effective_noise
    noise = _vuniform4(k1, -n, n) if n > 0 else 0.0
    return st._replace(acc_belt=jnp.clip(acc + noise, 0.0, 1.0), key=key)


def _use_sort_kernel(cfg: SimConfig, n_envs: int) -> bool:
    """Trace-time choice of the fused Pallas sort kernel.

    "auto" enables it on a TPU backend when the batch fills whole
    128-lane rows; "pallas"/"xla" force it.  The kernel is
    bitwise-identical to the XLA path (tests/test_sort_pallas.py,
    artifacts/sort_pallas_ab.py, plus a per-capture re-assert in
    bench.py), so this is purely a scheduling choice.  Two guards:

    * the kernel hardcodes jax.random's PARTITIONABLE threefry
      semantics; with ``jax_threefry_partitionable`` disabled the XLA
      path would draw different bits, so "auto" refuses the kernel and
      "pallas" raises rather than silently break the bitwise claim;
    * a pallas_call is opaque to XLA's SPMD partitioner, so mesh-sharded
      fastb rollouts must run the step under ``jax.shard_map``
      (``parallel.fastb_shard.shard_step`` — inside the shard the state
      is local and the kernel applies per shard); a pjit-sharded call
      without shard_map would replicate state through the kernel."""
    mode = getattr(cfg, "sort_kernel", "auto")
    if mode == "xla":
        return False
    partitionable = bool(jax.config.jax_threefry_partitionable)
    if mode == "pallas" and not partitionable:
        raise ValueError(
            "sort_kernel='pallas' requires jax_threefry_partitionable "
            "(the kernel reproduces the partitionable threefry stream; "
            "with the flag off the XLA path draws different bits)")
    from ..ops import sort_pallas
    ok = sort_pallas.supported(n_envs)
    if mode == "pallas":
        if not ok:
            raise ValueError(
                "sort_kernel='pallas' needs n_envs % 128 == 0 and "
                f"n_envs >= 128, got {n_envs}")
        return True
    return ok and partitionable and jax.default_backend() == "tpu"


def _use_step_kernel(cfg: SimConfig, st: BState) -> bool:
    """Trace-time choice of the fused FULL-STEP Pallas kernel
    (ops/step_pallas.py) for the monolith variants.  Same guard set as
    _use_sort_kernel: partitionable threefry only, refuse under a
    pjit-auto-sharded state (shard_map is fine — the production
    multi-chip glue), events bale mode and whole 128-lane rows only."""
    mode = getattr(cfg, "step_kernel", "auto")
    if mode == "xla":
        return False
    partitionable = bool(jax.config.jax_threefry_partitionable)
    from ..ops import step_pallas
    ok = step_pallas.supported(cfg, st.current_step.shape[0])
    if mode == "pallas":
        if not partitionable:
            raise ValueError(
                "step_kernel='pallas' requires jax_threefry_partitionable")
        if not ok:
            raise ValueError(
                "step_kernel='pallas' needs bale_mode='events' and "
                f"n_envs % 128 == 0, got bale_mode={cfg.bale_mode!r}, "
                f"n_envs={st.current_step.shape[0]}")
        if step_pallas.pjit_auto_sharded(st.sort_counts):
            raise ValueError(
                "step_kernel='pallas' under a pjit-auto-sharded state: "
                "run the step via parallel.fastb_shard.shard_step "
                "(shard_map) or use step_kernel='xla'")
        return True
    return (ok and partitionable and jax.default_backend() == "tpu"
            and not step_pallas.pjit_auto_sharded(st.sort_counts))


def _sort_material(cfg: SimConfig, st: BState):
    total_input = st.sort_counts.sum(axis=0)              # (N,)
    key = st.key
    support = _support_for(cfg)
    use_kernel = _use_sort_kernel(cfg, st.sort_counts.shape[1])
    if use_kernel:
        # pjit-auto-sharded state (NamedSharding under jit WITHOUT
        # shard_map): the pallas_call is opaque to the SPMD partitioner
        # and would silently replicate the env batch — refuse/fallback
        # (ADVICE r3; the sanctioned multi-chip path is
        # parallel.fastb_shard.shard_step, whose shard_map blocks are
        # manual and keep the kernel per-shard)
        from ..ops import sort_pallas
        if sort_pallas.pjit_auto_sharded(st.sort_counts):
            if getattr(cfg, "sort_kernel", "auto") == "pallas":
                raise ValueError(
                    "sort_kernel='pallas' under a pjit-auto-sharded "
                    "state: the kernel cannot be SPMD-partitioned; run "
                    "the step via parallel.fastb_shard.shard_step "
                    "(shard_map) or use sort_kernel='xla'")
            use_kernel = False
    if use_kernel:
        # fused Pallas kernel: the whole chain (threefry splits, uniform
        # draws, 12 inverse-CDF hypergeometric samples) in one VMEM
        # kernel — bitwise-identical, ~1.5x faster (ops/sort_pallas.py)
        from ..ops import sort_pallas
        leftover, true_arr, false_arr, key = sort_pallas.sort_material_fused(
            st.sort_counts, st.acc_sorter, key, support=support)
    else:
        # pre-draw the 12 uniforms with the same key tree _mvhg4 used
        # inline (bit-identical trajectories), then run the shared
        # redistribution core
        us = []
        for _ in range(4):
            ks = _vsplit(key)
            key, sk = ks[:, 0], ks[:, 1]
            k3 = _vsplit(sk, 3)
            us.extend(_vuniform(k3[:, j]) for j in range(3))
        leftover, true_arr, false_arr = redistribute_u(
            st.sort_counts, st.acc_sorter, jnp.stack(us), support)

    e_input = leftover.sum(axis=0).astype(I32)
    cont_true = st.cont_true.at[:4].add(true_arr)
    cont_true = cont_true.at[4].add(e_input)
    purity = jnp.where(
        total_input > 0,
        1.0 - (total_input - true_arr.sum(axis=0)).astype(F32)
        / jnp.maximum(total_input, 1).astype(F32),
        0.0,
    )
    st = st._replace(
        cont_true=cont_true,
        cont_false=st.cont_false + false_arr,
        key=key,
    )
    return purity, st


def _onehot_rows(m, nrows):
    """bool[(nrows, N)]: row r true where m == r."""
    return lax.broadcasted_iota(I32, (nrows, 1), 0) == m[None, :]


def _row_at(arr, m, nrows):
    """arr[(nrows, N)] gathered at per-env row m -> (N,), via one-hot."""
    return jnp.sum(jnp.where(_onehot_rows(m, nrows), arr,
                             jnp.zeros((), arr.dtype)), axis=0)


def _press_bale(cfg: SimConfig, st: BState, m, n, q, pred) -> BState:
    """Bale out (predicated), full-(5, MAX, N) masked updates — see
    core.fast._press_bale for the row-mask rationale.

    In event mode the press finish is appended to the compact (E, N) log
    instead; the dense bale lists are a deterministic host-side replay
    (core.bale_events.rebuild_bales, tested bitwise vs full mode)."""
    if resolved_bale_mode(cfg) == "events":
        lanes = lax.broadcasted_iota(I32, (st.ev_n.shape[0], 1), 0)
        hit = (lanes == st.ev_cnt[None, :]) & pred[None, :]
        return st._replace(
            ev_mat=jnp.where(hit, m[None, :].astype(I16), st.ev_mat),
            ev_n=jnp.where(hit, n[None, :].astype(I16), st.ev_n),
            ev_q=jnp.where(hit, (q * 100.0).astype(I16)[None, :], st.ev_q),
            ev_cnt=st.ev_cnt + pred.astype(I32),
        )
    bs = cfg.effective_balesize
    q_int = (q * 100.0).astype(I16)[None, None, :]
    full = n // bs                                       # (N,)
    rem = (n % bs).astype(I16)
    rows = lax.broadcasted_iota(I32, (5, 1, 1), 0)
    lanes = lax.broadcasted_iota(I32, (1, cfg.max_bales, 1), 1)
    sel = pred[None, None, :] & (rows == m[None, None, :])   # (5, 1→MAX, N)
    cnt_m = _row_at(st.bale_cnt, m, 5)                   # (N,)

    cm = cnt_m[None, None, :]
    new_mask = sel & (lanes >= cm) & (lanes < cm + full[None, None, :])
    bale_size = jnp.where(new_mask, I16(bs), st.bale_size)
    bale_qual = jnp.where(new_mask, q_int, st.bale_qual)
    cnt2 = cnt_m + full                                  # (N,)

    big_rem = rem.astype(F32) > F32(bs) * F32(cfg.bale_remainder_threshold)
    has_rem = rem > 0
    own = has_rem & (big_rem | (cnt2 == 0))              # (N,)
    app = sel & own[None, None, :] & (lanes == cnt2[None, None, :])
    bale_size = jnp.where(app, rem[None, None, :], bale_size)
    bale_qual = jnp.where(app, q_int, bale_qual)
    merge = has_rem & ~big_rem & (cnt2 > 0)
    mm = sel & merge[None, None, :] & (lanes == (cnt2 - 1)[None, None, :])
    bale_size = jnp.where(mm, bale_size + rem[None, None, :], bale_size)
    cnt3 = (cnt2 + jnp.where(own, I32(1), I32(0))).astype(I32)

    bale_cnt = jnp.where(pred[None, :] & _onehot_rows(m, 5),
                         cnt3[None, :], st.bale_cnt)
    return st._replace(bale_size=bale_size, bale_qual=bale_qual,
                       bale_cnt=bale_cnt)


def _check_press_status(cfg: SimConfig, st: BState) -> BState:
    for p in range(2):
        busy = st.press_timer[p] > 0
        timer = jnp.where(busy, st.press_timer[p] - 1, st.press_timer[p])
        done = busy & (timer == 0)
        st = _press_bale(cfg, st, st.press_mat[p], st.press_n[p],
                         st.press_q[p], done)
        st = st._replace(
            press_timer=st.press_timer.at[p].set(timer),
            press_mat=st.press_mat.at[p].set(
                jnp.where(done, 0, st.press_mat[p])),
            press_n=st.press_n.at[p].set(jnp.where(done, 0, st.press_n[p])),
            press_q=st.press_q.at[p].set(
                jnp.where(done, 0.0, st.press_q[p])),
        )
    return st


def _container_level(st: BState, m):
    ct = _row_at(st.cont_true, m, 5)
    cf = _row_at(st.cont_false, jnp.minimum(m, 3), 4)
    return jnp.where(m < 4, ct + cf, st.cont_true[4])


def _use_press(cfg: SimConfig, st: BState, press, m, pred) -> BState:
    """Load a press (predicated); press/m are i32[N]."""
    p0 = press == 1                                       # True -> press row 0
    busy = jnp.where(p0, st.press_timer[0], st.press_timer[1]) > 0
    go = pred & ~busy
    total = _container_level(st, m)
    true_m = jnp.where(m < 4, _row_at(st.cont_true, m, 5), total)
    quality = jnp.where(
        (m < 4) & (total > 0),
        true_m.astype(F32) / jnp.maximum(total, 1).astype(F32), 0.0)
    press_time = jnp.where(p0, cfg.press_time_1,
                           cfg.press_time_2).astype(I32)
    clear_true = go[None, :] & _onehot_rows(m, 5)
    clear_false = (go & (m < 4))[None, :] & _onehot_rows(jnp.minimum(m, 3), 4)
    hit = _onehot_rows(jnp.where(p0, 0, 1), 2)            # (2, N) press row
    upd = hit & go[None, :]
    return st._replace(
        last_press_started=st.last_press_started | go,
        last_press_amount=jnp.where(go, total, st.last_press_amount
                                    ).astype(I32),
        cont_true=jnp.where(clear_true, 0, st.cont_true),
        cont_false=jnp.where(clear_false, 0, st.cont_false),
        press_timer=jnp.where(upd, press_time[None, :], st.press_timer),
        press_mat=jnp.where(upd, m[None, :], st.press_mat),
        press_n=jnp.where(upd, total[None, :], st.press_n).astype(I32),
        press_q=jnp.where(upd, quality[None, :], st.press_q),
    )


def _press_action_rules(cfg: SimConfig, st: BState, press_id, m):
    st = _check_press_status(cfg, st)
    return _use_press(cfg, st, jnp.maximum(press_id, 1), m, press_id != 0)


def _validate_press(cfg: SimConfig, st: BState, press_id, m):
    busy = jnp.where(
        press_id == 1, st.press_timer[0] > 0,
        jnp.where(press_id == 2, st.press_timer[1] > 0, False))
    level = _container_level(st, m)
    ok = (~busy) & (level >= cfg.effective_balesize)
    return jnp.where(press_id == 0, True, ok)


def press_action_masks(cfg: SimConfig, st: BState):
    """bool[N, 11] (batch-first, matching the vmapped fast engine)."""
    levels = jnp.concatenate(
        [st.cont_true[:4] + st.cont_false, st.cont_true[4:5]])   # (5, N)
    enough = levels >= cfg.effective_balesize
    p1 = (st.press_timer[0] == 0)[None, :]
    p2 = (st.press_timer[1] == 0)[None, :]
    ones = jnp.ones((1, enough.shape[1]), bool)
    return jnp.concatenate([ones, enough & p1, enough & p2]).T


def monolith_action_masks(cfg: SimConfig, st: BState):
    m = press_action_masks(cfg, st)
    return jnp.concatenate([m, m], axis=1)


def _sorting_rules(st: BState):
    c = st.belt_counts
    return jnp.where(c[0] + c[2] > c[1] + c[3], 0, 1).astype(I32)


def _check_container_level(cfg: SimConfig, st: BState):
    free1 = st.press_timer[0] == 0
    free2 = st.press_timer[1] == 0
    free_press = jnp.where(free1, 1, jnp.where(free2, 2, 0)).astype(I32)
    levels_ad = st.cont_true[:4] + st.cont_false          # (4, N)
    best_ad = jnp.argmax(levels_ad, axis=0)
    best_lvl = jnp.max(levels_ad, axis=0)
    lvl_e = st.cont_true[4]
    best_idx = jnp.where(lvl_e > best_lvl, 4, best_ad).astype(I32)
    best_lvl = jnp.maximum(best_lvl, lvl_e)
    ok = (free_press > 0) & (best_lvl > 0)
    return jnp.where(ok, free_press, 0), jnp.where(ok, best_idx, 0)


def _container_purities(cfg: SimConfig, st: BState):
    total = st.cont_true[:4] + st.cont_false
    purity = st.cont_true[:4].astype(F32) / jnp.maximum(total, 1).astype(F32)
    return jnp.where(total > 0, purity, F32(cfg.quality_threshold))


def get_sort_obs(cfg: SimConfig, st: BState):
    """f32[N, 13]."""
    total = st.belt_counts.sum(axis=0)
    props = jnp.where(total[None, :] > 0,
                      st.belt_counts.astype(F32)
                      / jnp.maximum(total, 1).astype(F32)[None, :], 0.0)
    diffs = _container_purities(cfg, st) - F32(cfg.quality_threshold)
    obs = jnp.concatenate(
        [st.belt_occupancy[None, :], props, st.acc_belt, diffs])
    return jnp.clip(obs, -1.0, 1.0).T


def get_press_obs(cfg: SimConfig, st: BState):
    """f32[N, 16]."""
    cap = F32(cfg.container_capacity)
    levels = jnp.concatenate(
        [st.cont_true[:4] + st.cont_false, st.cont_true[4:5]]
    ).astype(F32) / cap
    sorter = st.sort_counts.astype(F32) / F32(cfg.stage_capacity)
    timers = st.press_timer.astype(F32) / jnp.array(
        [cfg.press_time_1, cfg.press_time_2], F32)[:, None]
    return jnp.clip(jnp.concatenate([levels, levels, sorter, timers]),
                    0.0, 1.0).T


def get_mono_obs(cfg: SimConfig, st: BState):
    return jnp.concatenate([get_sort_obs(cfg, st), get_press_obs(cfg, st)],
                           axis=1)


def _sorting_reward(cfg: SimConfig, st: BState):
    purities = _container_purities(cfg, st)
    score = jnp.sum(purities - F32(cfg.purity_threshold_theta), axis=0)
    raw = (score / 4.0) * F32(cfg.purity_scaling_factor)
    return jnp.tanh(raw / F32(cfg.tanh_temperature))


def _press_reward(cfg: SimConfig, st: BState):
    cap = F32(cfg.container_capacity)
    levels = jnp.concatenate(
        [st.cont_true[:4] + st.cont_false, st.cont_true[4:5]]).astype(F32)
    fill = levels / cap
    catastrophic = jnp.any(fill > 1.0, axis=0)
    max_penalty = jnp.where(
        jnp.any(fill > 0.95, axis=0), F32(cfg.overflow_penalty_severe),
        jnp.where(jnp.any(fill > 0.90, axis=0),
                  F32(cfg.overflow_penalty_mild), 0.0))
    overall = levels.sum(axis=0) / (5.0 * cap)
    state_reward = overall * F32(cfg.max_state_reward)
    bs = cfg.effective_balesize
    amount = st.last_press_amount
    num_bales = amount // bs
    rem = amount % bs
    dist = jnp.minimum(rem, bs - rem)
    bef = F32(cfg.bale_efficiency_factor)
    efficiency = (1.0 - 4.0 * (dist.astype(F32) / F32(bs))) * bef
    w = jnp.minimum(num_bales, 3)
    peak = jnp.where(w == 0, F32(0.0),
                     jnp.where(w == 1, F32(1.0 / 3.0),
                               jnp.where(w == 2, F32(2.0 / 3.0), F32(1.0))))
    action_reward = jnp.where(st.last_press_started,
                              efficiency + (peak - bef), 0.0)
    normal = jnp.clip(state_reward + action_reward, -1.0, 1.0)
    reward = jnp.where(
        catastrophic, F32(cfg.overflow_penalty_catastrophic),
        jnp.where(max_penalty < 0.0, max_penalty, normal))
    early = catastrophic | (max_penalty < 0.0)
    st = st._replace(
        last_press_started=jnp.where(early, st.last_press_started,
                                     jnp.zeros_like(st.last_press_started)),
        last_press_amount=jnp.where(early, st.last_press_amount, 0),
    )
    return reward, st


def _finish(cfg: SimConfig, st: BState):
    st = st._replace(current_step=st.current_step + 1)
    return st, st.current_step >= cfg.max_steps


def _apply_sort(cfg, st, sort_mode):
    st = st._replace(sensor_setting=jnp.asarray(sort_mode, I32))
    st = _update_accuracy(cfg, st)
    return _sort_material(cfg, st)


def masked_uniform_choice(mask, u):
    """Uniform pick over the True entries of ``mask[..., A]`` from ONE
    f32 uniform: rank r = floor(u * n_valid) (clamped), return the index
    of the (r+1)-th valid entry via an inclusive prefix count.

    Log-free by design (vs Gumbel-argmax categorical): pure
    compare/add/multiply arithmetic, so the fused step kernel
    (ops/step_pallas.py) replicates the draw bit for bit — Mosaic and
    XLA need not agree on transcendental lowerings.  Distribution: u is
    a 24-bit-mantissa uniform and n_valid <= 22, so the pick is uniform
    to ~2^-24 — the same granularity a Gumbel draw has per lane."""
    c = jnp.cumsum(mask.astype(I32), axis=-1)
    nv = c[..., -1]
    r = jnp.minimum((u * nv.astype(F32)).astype(I32), nv - 1)
    return jnp.sum((c <= r[..., None]).astype(I32), axis=-1).astype(I32)


def _sample_masked_press(cfg, st: BState):
    mask = press_action_masks(cfg, st)                   # (N, 11)
    ks = _vsplit(st.key)
    key, sk = ks[:, 0], ks[:, 1]
    a = masked_uniform_choice(mask, _vuniform(sk))
    press_id = jnp.where(a == 0, 0, jnp.where(a <= 5, 1, 2)).astype(I32)
    mat = jnp.where(a == 0, 0, (a - 1) % 5).astype(I32)
    return press_id, mat, st._replace(key=key)


# ---------------------------------------------------------------------------
# Variant steps (batched: action is i32[N])
# ---------------------------------------------------------------------------

def step_sort(cfg: SimConfig, st: BState, action):
    if _use_step_kernel(cfg, st):
        from ..ops import step_pallas
        return step_pallas.step_mono(
            cfg, st, action, variant="sort", support=_support_for(cfg))
    st = _update_environment(cfg, st)
    purity, st = _apply_sort(cfg, st, action)
    press_id, mat, st = _sample_masked_press(cfg, st)
    st = _press_action_rules(cfg, st, press_id, mat)
    reward = _sorting_reward(cfg, st)
    obs = get_sort_obs(cfg, st)
    st, terminated = _finish(cfg, st)
    return st, BStepOut(obs, reward, terminated,
                        jnp.asarray(action, I32), reward,
                        jnp.zeros_like(reward), purity)


def step_press(cfg: SimConfig, st: BState, action, sort_policy=None,
               use_action_masking: bool = True):
    if sort_policy is None and _use_step_kernel(cfg, st):
        # (with a frozen sort policy the MLP forward stays in XLA — the
        # kernel covers the rule-based sort_mode path only)
        from ..ops import step_pallas
        return step_pallas.step_mono(
            cfg, st, action, variant="press", masked=use_action_masking,
            support=_support_for(cfg))
    st = _update_environment(cfg, st)
    if sort_policy is not None:
        apply_fn, params = sort_policy
        sort_mode = jnp.argmax(apply_fn(params, get_sort_obs(cfg, st)),
                               axis=-1).astype(I32)
    else:
        sort_mode = _sorting_rules(st)
    purity, st = _apply_sort(cfg, st, sort_mode)
    a = jnp.asarray(action, I32)
    press_id = jnp.where(a == 0, 0, jnp.where(a <= 5, 1, 2)).astype(I32)
    mat = jnp.where(a == 0, 0, (a - 1) % 5).astype(I32)
    if not use_action_masking:
        valid = _validate_press(cfg, st, press_id, mat)
        press_id = jnp.where(valid, press_id, 0).astype(I32)
        mat = jnp.where(valid, mat, 0).astype(I32)
    st = _press_action_rules(cfg, st, press_id, mat)
    reward, st = _press_reward(cfg, st)
    obs = get_press_obs(cfg, st)
    st, terminated = _finish(cfg, st)
    return st, BStepOut(obs, reward, terminated, a,
                        jnp.zeros_like(reward), reward, purity)


def step_mono_external(cfg: SimConfig, st: BState, action,
                       use_action_masking: bool = True):
    if _use_step_kernel(cfg, st):
        from ..ops import step_pallas
        return step_pallas.step_mono(
            cfg, st, action, variant="external",
            masked=use_action_masking, support=_support_for(cfg))
    st = _update_environment(cfg, st)
    a = jnp.asarray(action, I32)
    sort_mode = a // 11
    press_disc = a % 11
    purity, st = _apply_sort(cfg, st, sort_mode)
    press_id = jnp.where(press_disc == 0, 0,
                         jnp.where(press_disc <= 5, 1, 2)).astype(I32)
    mat = jnp.where(press_disc == 0, 0, (press_disc - 1) % 5).astype(I32)
    if not use_action_masking:
        valid = _validate_press(cfg, st, press_id, mat)
        dispatched = _press_action_rules(cfg, st, press_id, mat)
        st = _select_state(valid, st, dispatched)
    else:
        st = _press_action_rules(cfg, st, press_id, mat)
    sr = _sorting_reward(cfg, st)
    pr, st = _press_reward(cfg, st)
    obs = get_mono_obs(cfg, st)
    st, terminated = _finish(cfg, st)
    return st, BStepOut(obs, sr + pr, terminated, a, sr, pr, purity)


def step_mono_rule(cfg: SimConfig, st: BState, action=None):
    if _use_step_kernel(cfg, st):
        from ..ops import step_pallas
        return step_pallas.step_mono(
            cfg, st, None, variant="rule", support=_support_for(cfg))
    st = _update_environment(cfg, st)
    sort_mode = _sorting_rules(st)
    press_id, mat = _check_container_level(cfg, st)
    purity, st = _apply_sort(cfg, st, sort_mode)
    st = _press_action_rules(cfg, st, press_id, mat)
    sr = _sorting_reward(cfg, st)
    pr, st = _press_reward(cfg, st)
    obs = get_mono_obs(cfg, st)
    st, terminated = _finish(cfg, st)
    flat = sort_mode * 11 + jnp.where(press_id == 0, 0,
                                      (press_id - 1) * 5 + mat + 1)
    return st, BStepOut(obs, sr + pr, terminated, flat, sr, pr, purity)


def step_mono_model(cfg: SimConfig, st: BState, sort_policy=None,
                    press_policy=None, use_action_masking: bool = True):
    """Reference mode='model' path (env_monolith.py:186-222): modular
    agents predict deterministically on the post-update, *pre-sort*
    state; a missing sort agent falls back to a random mode, a missing
    press agent to a random masked (or uniform-11) press.  Threefry in
    place of the reference's PCG64 streams — distribution-equivalent
    counterpart of core.step.step_mono_model."""
    st = _update_environment(cfg, st)
    n = st.current_step.shape[0]

    def draw(logits):
        nonlocal st
        ks = _vsplit(st.key)
        st = st._replace(key=ks[:, 0])
        return _vcategorical(ks[:, 1], logits).astype(I32)

    # Block A: sorting action (env_monolith.py:189-195)
    if sort_policy is not None:
        apply_fn, params = sort_policy
        sort_mode = jnp.argmax(apply_fn(params, get_sort_obs(cfg, st)),
                               axis=-1).astype(I32)
    else:
        sort_mode = draw(jnp.zeros((n, 2), F32))
    # Block B: pressing action on the pre-sort obs/mask (:197-221)
    if press_policy is not None:
        apply_fn, params = press_policy
        logits = apply_fn(params, get_press_obs(cfg, st))
        if use_action_masking:
            logits = jnp.where(press_action_masks(cfg, st), logits,
                               -jnp.inf)
        press_disc = jnp.argmax(logits, axis=-1).astype(I32)
    elif use_action_masking:
        press_disc = draw(
            jnp.where(press_action_masks(cfg, st), 0.0, -jnp.inf))
    else:
        press_disc = draw(jnp.zeros((n, 11), F32))
    a_flat = sort_mode * 11 + press_disc

    purity, st = _apply_sort(cfg, st, sort_mode)
    press_id = jnp.where(press_disc == 0, 0,
                         jnp.where(press_disc <= 5, 1, 2)).astype(I32)
    mat = jnp.where(press_disc == 0, 0, (press_disc - 1) % 5).astype(I32)
    if not use_action_masking:
        valid = _validate_press(cfg, st, press_id, mat)
        press_id = jnp.where(valid, press_id, 0).astype(I32)
        mat = jnp.where(valid, mat, 0).astype(I32)
    st = _press_action_rules(cfg, st, press_id, mat)
    sr = _sorting_reward(cfg, st)
    pr, st = _press_reward(cfg, st)
    obs = get_mono_obs(cfg, st)
    st, terminated = _finish(cfg, st)
    return st, BStepOut(obs, sr + pr, terminated, a_flat, sr, pr, purity)


def step_mono_random(cfg: SimConfig, st: BState,
                     use_action_masking: bool = True):
    """Reference mode='random' (env_monolith.py:152-164) with threefry in
    place of the legacy global MT19937 — distribution-equivalent (the
    bit-exact legacy stream lives in core.step.step_mono_legacy_random).
    Unmasked invalid presses become no-ops (timers still tick)."""
    st = _update_environment(cfg, st)
    n = st.current_step.shape[0]
    ks = _vsplit(st.key)
    st = st._replace(key=ks[:, 0])
    if use_action_masking:
        mask = monolith_action_masks(cfg, st)
        a = _vcategorical(ks[:, 1],
                          jnp.where(mask, 0.0, -jnp.inf)).astype(I32)
    else:
        a = _vcategorical(ks[:, 1], jnp.zeros((n, 22), F32)).astype(I32)
    sort_mode = a // 11
    press_disc = a % 11
    purity, st = _apply_sort(cfg, st, sort_mode)
    press_id = jnp.where(press_disc == 0, 0,
                         jnp.where(press_disc <= 5, 1, 2)).astype(I32)
    mat = jnp.where(press_disc == 0, 0, (press_disc - 1) % 5).astype(I32)
    if not use_action_masking:
        valid = _validate_press(cfg, st, press_id, mat)
        press_id = jnp.where(valid, press_id, 0).astype(I32)
        mat = jnp.where(valid, mat, 0).astype(I32)
    st = _press_action_rules(cfg, st, press_id, mat)
    sr = _sorting_reward(cfg, st)
    pr, st = _press_reward(cfg, st)
    obs = get_mono_obs(cfg, st)
    st, terminated = _finish(cfg, st)
    return st, BStepOut(obs, sr + pr, terminated, a, sr, pr, purity)


def autoreset(cfg: SimConfig, st: BState) -> BState:
    fresh = _reset_from_keys(cfg, st.key)
    return fresh._replace(
        total_input_units=jnp.zeros_like(st.total_input_units))


def with_autoreset(cfg: SimConfig, step_fn):
    """step_fn(cfg, st, action) batched; resets terminated instances."""
    def stepped(st, action):
        st, out = step_fn(cfg, st, action)
        fresh = autoreset(cfg, st)
        return _select_state(out.terminated, st, fresh), out
    return stepped


def mono_autoreset_step(cfg: SimConfig, variant: str,
                        use_action_masking: bool = True):
    """Autoreset rollout step ``(st, action) -> (st, out)`` for any
    kernel-covered variant ('rule' | 'external' | 'sort' | 'press' —
    the name predates the sort/press extension).

    When the full-step kernel applies (ops/step_pallas.py), the
    terminated-instance reset is fused INTO the kernel (the
    ``_select_state`` over ~26 leaves plus the reset's split/bernoulli
    otherwise run as separate XLA ops every step); semantics and bits
    are identical to ``with_autoreset(cfg, step_fn)`` on the XLA path
    (tests/test_step_pallas.py)."""
    if variant == "rule":
        base = lambda c, s, a: step_mono_rule(c, s)  # noqa: E731
    elif variant == "external":
        base = lambda c, s, a: step_mono_external(  # noqa: E731
            c, s, a, use_action_masking)
    elif variant == "sort":
        base = lambda c, s, a: step_sort(c, s, a)  # noqa: E731
    elif variant == "press":
        base = lambda c, s, a: step_press(  # noqa: E731
            c, s, a, None, use_action_masking)
    else:
        raise ValueError(f"unknown variant {variant!r}")
    fallback = with_autoreset(cfg, base)

    def stepped(st, action):
        if _use_step_kernel(cfg, st):
            from ..ops import step_pallas
            return step_pallas.step_mono(
                cfg, st, None if variant == "rule" else action,
                variant=variant, masked=use_action_masking,
                support=_support_for(cfg), autoreset=True)
        return fallback(st, action)
    return stepped
