"""Fast TPU path: f32/i32/threefry implementation of the plant.

The parity engine (``dynamics.py``) reproduces NumPy bit-for-bit but needs
u64/f64 — fine on CPU, but this TPU runtime emulates f64 at ~49-bit
precision and compiles x64 graphs glacially.  This module is the
*production* path: identical dynamics, native TPU dtypes, and
``jax.random`` (threefry) streams.  It is equivalent to the reference **in
distribution**, not bit-for-bit:

* the per-unit redistribution loop of ``sort_material``
  (reference ``env_super.py:553-567``) — sequentially removing units with
  probability proportional to current leftovers — is exactly sampling
  without replacement from the leftover multiset, i.e. the removed counts
  follow a multivariate hypergeometric distribution.  We sample it in
  O(support) fully-vectorized inverse-CDF form instead of ~100 sequential
  draws: 3 conditional hypergeometric draws per station, each an
  128-lane pmf built from the ratio recurrence
  P(k+1)/P(k) = (K-k)(n-k) / ((k+1)(N-K-n+k+1)).
* integer state (counts, containers, presses, bales, masks) follows the
  same update rules as the parity engine, so invariants (conservation,
  mask soundness) are preserved exactly;
* float bookkeeping (accuracies, occupancies, purities, rewards) is f32
  with plain scaled rounding.

All functions are vmappable; state layout mirrors ``state.EnvState`` minus
the PCG64 streams (a single threefry key per instance).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config.config import SimConfig

I32 = jnp.int32
I16 = jnp.int16
F32 = jnp.float32

_PATTERNS = jnp.array(
    [[0.40, 0.15, 0.35, 0.10],
     [0.15, 0.40, 0.10, 0.35]],
    F32,
)

_HG_SUPPORT = 104  # >= max draw (input_batch_size=100) + slack; the
# support axis is HBM-traffic-critical (12 prefix pipelines per step),
# so keep it as tight as the dynamics allow


def _check_support(cfg: SimConfig) -> None:
    """Guard the fixed-support assumption (same bound as
    fastb._support_for): the pmf support must cover the largest possible
    false-unit count, else sampling would silently truncate."""
    bs = cfg.input_batch_size
    max_target = int(0.40 * bs) + 4
    min_acc = max(0.0, min(cfg.baseline_accuracy) - cfg.effective_noise)
    max_false = int(max_target * (1.0 - min_acc) + 0.5) + 1
    if max_false + 2 > _HG_SUPPORT:
        raise ValueError(
            f"hypergeometric support bound {max_false + 2} exceeds the "
            f"fast engine cap {_HG_SUPPORT}: config is outside the "
            "sampling domain (input_batch_size/baseline_accuracy/noise)")


class FastEnvState(NamedTuple):
    input_counts: jax.Array   # i32[4]
    belt_counts: jax.Array    # i32[4]
    sort_counts: jax.Array    # i32[4]
    acc_belt: jax.Array       # f32[4]
    acc_sorter: jax.Array     # f32[4]
    sensor_setting: jax.Array  # i32
    input_occupancy: jax.Array  # f32
    belt_occupancy: jax.Array   # f32
    cont_true: jax.Array      # i32[5]
    cont_false: jax.Array     # i32[4]
    press_timer: jax.Array    # i32[2]
    press_mat: jax.Array      # i32[2]
    press_n: jax.Array        # i32[2]
    press_q: jax.Array        # f32[2]
    bale_size: jax.Array      # i16[5, MAX] (sizes <= total episode input)
    bale_qual: jax.Array      # i16[5, MAX]
    bale_cnt: jax.Array       # i32[5]
    last_press_started: jax.Array  # bool
    last_press_amount: jax.Array   # i32
    gen_pattern_first: jax.Array   # i32 (0/1: which pattern row is first)
    gen_pattern_idx: jax.Array     # i32
    gen_step_counter: jax.Array    # i32
    current_step: jax.Array        # i32
    total_input_units: jax.Array   # i32
    key: jax.Array                 # threefry key u32[2]


class FastStepOut(NamedTuple):
    obs: jax.Array
    reward: jax.Array       # f32
    terminated: jax.Array
    action: jax.Array
    sort_reward: jax.Array
    press_reward: jax.Array
    purity: jax.Array


def reset(cfg: SimConfig, key) -> FastEnvState:
    """Fresh instance state from a threefry key (vmap over keys to batch)."""
    _check_support(cfg)
    key, k1 = jax.random.split(key)
    # f32 p pins the draw's uniform to f32 under jax_enable_x64 too:
    # the fast engines are f32 engines and their trajectories must not
    # depend on the ambient x64 flag (the full-step kernel replicates
    # the f32 recipe bitwise — ops/step_pallas.py fused autoreset)
    first = jax.random.bernoulli(k1, jnp.float32(0.5)).astype(I32)

    z4 = jnp.zeros(4, I32)
    return FastEnvState(
        input_counts=z4,
        belt_counts=z4,
        sort_counts=z4,
        acc_belt=jnp.asarray(cfg.baseline_accuracy, F32),
        acc_sorter=jnp.asarray(cfg.baseline_accuracy, F32),
        sensor_setting=jnp.zeros((), I32),
        input_occupancy=jnp.zeros((), F32),
        belt_occupancy=jnp.zeros((), F32),
        cont_true=jnp.zeros(5, I32),
        cont_false=z4,
        press_timer=jnp.zeros(2, I32),
        press_mat=jnp.zeros(2, I32),
        press_n=jnp.zeros(2, I32),
        press_q=jnp.zeros(2, F32),
        bale_size=jnp.zeros((5, cfg.max_bales), I16),
        bale_qual=jnp.zeros((5, cfg.max_bales), I16),
        bale_cnt=jnp.zeros(5, I32),
        last_press_started=jnp.zeros((), bool),
        last_press_amount=jnp.zeros((), I32),
        gen_pattern_first=first,
        gen_pattern_idx=jnp.zeros((), I32),
        gen_step_counter=jnp.zeros((), I32),
        current_step=jnp.zeros((), I32),
        total_input_units=jnp.zeros((), I32),
        key=key,
    )


def reset_batch(cfg: SimConfig, key, n: int) -> FastEnvState:
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k: reset(cfg, k))(keys)


# ---------------------------------------------------------------------------
# Sampling helpers
# ---------------------------------------------------------------------------

def _prefix_sum(x):
    """Inclusive prefix sum along the last axis via Hillis-Steele doubling
    (log2(support) cheap roll+add stages — XLA's cumsum lowers poorly on
    TPU for short axes)."""
    idx = jax.lax.broadcasted_iota(I32, x.shape, x.ndim - 1)
    s = 1
    while s < x.shape[-1]:
        x = x + jnp.where(idx >= s, jnp.roll(x, s, axis=-1), 0.0)
        s *= 2
    return x


def _prefix_prod(x):
    idx = jax.lax.broadcasted_iota(I32, x.shape, x.ndim - 1)
    s = 1
    while s < x.shape[-1]:
        x = x * jnp.where(idx >= s, jnp.roll(x, s, axis=-1), 1.0)
        s *= 2
    return x


def _hypergeom(key, N, K, n):
    """One draw X ~ Hypergeometric(N, K, n): successes when drawing n
    without replacement from N items of which K are marked.  Exact
    inverse-CDF over a fixed 128-lane support; all inputs traced i32.

    Product-space pmf: unnormalized pmf relative to pmf(lo)=1 is the
    prefix product of the ratio recurrence
    P(k+1)/P(k) = (K-k)(n-k) / ((k+1)(N-K-n+k+1)); the worst-case dynamic
    range (~C(100,50) ~ 1e29) fits f32, so no log/exp is needed."""
    Nf = jnp.maximum(N, 1).astype(F32)
    ks = jnp.arange(_HG_SUPPORT, dtype=I32)
    kf = ks.astype(F32)
    Kf = K.astype(F32)
    nf = n.astype(F32)
    lo = jnp.maximum(0, n - (N - K))
    hi = jnp.minimum(K, n)
    num = (Kf - kf) * (nf - kf)
    den = (kf + 1.0) * (Nf - Kf - nf + kf + 1.0)
    in_band = (ks >= lo) & (ks < hi)
    ratio = jnp.where(in_band, num / den, 1.0)
    # exclusive prefix product = pmf[k] relative to pmf[lo] (ones below lo)
    pp = _prefix_prod(ratio)
    pmf = jnp.concatenate([jnp.ones(1, F32), pp[:-1]])
    valid = (ks >= lo) & (ks <= hi)
    pmf = jnp.where(valid, pmf, 0.0)
    cdf = _prefix_sum(pmf)
    u = jax.random.uniform(key, dtype=F32) * cdf[-1]
    x = jnp.sum((cdf < u).astype(I32))
    return jnp.clip(x, lo, hi)


def _mvhg4(key, counts, n):
    """Multivariate hypergeometric over 4 categories: remove ``n`` units
    uniformly without replacement from multiset ``counts`` (i32[4]).
    Returns removed-per-category (i32[4])."""
    N = counts.sum()
    n = jnp.minimum(n, N)
    k1, k2, k3 = jax.random.split(key, 3)
    d0 = _hypergeom(k1, N, counts[0], n)
    N1 = N - counts[0]
    n1 = n - d0
    d1 = _hypergeom(k2, N1, counts[1], n1)
    N2 = N1 - counts[1]
    n2 = n1 - d1
    d2 = _hypergeom(k3, N2, counts[2], n2)
    d3 = n2 - d2
    return jnp.stack([d0, d1, d2, d3]).astype(I32)


# ---------------------------------------------------------------------------
# Plant dynamics (fast)
# ---------------------------------------------------------------------------

def _generate_input(cfg: SimConfig, st: FastEnvState):
    bs = cfg.input_batch_size
    switch = st.gen_step_counter >= cfg.steps_per_pattern
    pattern_idx = jnp.where(switch, (st.gen_pattern_idx + 1) % 2,
                            st.gen_pattern_idx)
    step_counter = jnp.where(switch, 0, st.gen_step_counter)
    row = (st.gen_pattern_first + pattern_idx) % 2
    ratios = _PATTERNS[row]
    units = jnp.floor(ratios * F32(bs)).astype(I32)
    remainder = I32(bs) - units.sum()

    key, k1 = jax.random.split(st.key)
    # remainder <= 4 in practice; draw 4 materials, apply first `remainder`.
    # One-hot matrix sum instead of 4 sequential scatters (scatters
    # serialize badly on TPU).
    ms = jax.random.randint(k1, (4,), 0, 4, I32)  # i32-pinned (x64-invariant)
    active = jnp.arange(4, dtype=I32) < remainder
    add = ((ms[:, None] == jnp.arange(4, dtype=I32)[None, :])
           & active[:, None]).sum(axis=0).astype(I32)
    units = units + add
    st = st._replace(
        gen_pattern_idx=pattern_idx,
        gen_step_counter=step_counter + 1,
        key=key,
    )
    return units, st


def _update_environment(cfg: SimConfig, st: FastEnvState) -> FastEnvState:
    st = st._replace(
        sort_counts=st.belt_counts,
        belt_counts=st.input_counts,
        belt_occupancy=st.input_occupancy,
    )
    counts, st = _generate_input(cfg, st)
    return st._replace(
        input_counts=counts,
        input_occupancy=counts.sum().astype(F32) / 100.0,
        acc_sorter=st.acc_belt,
        total_input_units=(st.total_input_units + counts.sum()).astype(I32),
    )


def _update_accuracy(cfg: SimConfig, st: FastEnvState) -> FastEnvState:
    base = jnp.asarray(cfg.baseline_accuracy, F32)
    boost_ac = jnp.array([cfg.boost, 0.0, cfg.boost, 0.0], F32)
    boost_bd = jnp.array([0.0, cfg.boost, 0.0, cfg.boost], F32)
    acc = base + jnp.where(st.sensor_setting == 0, boost_ac,
                           jnp.where(st.sensor_setting == 1, boost_bd, 0.0))
    key, k1 = jax.random.split(st.key)
    n = cfg.effective_noise
    noise = jax.random.uniform(k1, (4,), F32, -n, n) if n > 0 else 0.0
    return st._replace(acc_belt=jnp.clip(acc + noise, 0.0, 1.0), key=key)


def _sort_material(cfg: SimConfig, st: FastEnvState):
    total_input = st.sort_counts.sum()
    leftover = st.sort_counts
    true_arr = jnp.zeros(4, I32)
    false_arr = jnp.zeros(4, I32)
    key = st.key
    for i in range(4):
        target = leftover[i]
        true_val = jnp.rint(target.astype(F32) * st.acc_sorter[i]).astype(I32)
        false_val = target - true_val
        true_arr = true_arr.at[i].set(true_val)
        false_arr = false_arr.at[i].set(false_val)
        leftover = leftover.at[i].set(false_val)
        key, sk = jax.random.split(key)
        removed = _mvhg4(sk, leftover, false_val)
        leftover = leftover - removed

    # note: under x64 (parity mode active in the same process) jnp.sum
    # promotes i32 -> i64; keep container updates i32
    e_input = leftover.sum().astype(I32)
    cont_true = st.cont_true.at[:4].add(true_arr)
    cont_true = cont_true.at[4].add(e_input)
    purity = jnp.where(
        total_input > 0,
        1.0 - (total_input - true_arr.sum()).astype(F32)
        / jnp.maximum(total_input, 1).astype(F32),
        0.0,
    )
    st = st._replace(
        cont_true=cont_true,
        cont_false=st.cont_false + false_arr,
        key=key,
    )
    return purity, st


def _press_bale(cfg: SimConfig, st: FastEnvState, m, n, q,
                pred) -> FastEnvState:
    """Bale out (predicated).  Written as full-(5, MAX) 2D masked updates
    instead of row gather + scatter: under vmap the dynamic row
    gather/scatter lowers to much more expensive code than a fused
    row-mask select (measured: the press path dominated the step)."""
    bs = cfg.effective_balesize
    q_int = (q * 100.0).astype(I16)
    full = n // bs
    rem = (n % bs).astype(I16)
    rows = jnp.arange(5, dtype=I32)[:, None]
    lanes = jnp.arange(cfg.max_bales, dtype=I32)[None, :]
    sel = pred & (rows == m)
    cnt_m = st.bale_cnt[m]

    new_mask = sel & (lanes >= cnt_m) & (lanes < cnt_m + full)
    bale_size = jnp.where(new_mask, I16(bs), st.bale_size)
    bale_qual = jnp.where(new_mask, q_int, st.bale_qual)
    cnt2 = cnt_m + full

    big_rem = rem.astype(F32) > F32(bs) * F32(cfg.bale_remainder_threshold)
    has_rem = rem > 0
    own = has_rem & (big_rem | (cnt2 == 0))
    app = sel & own & (lanes == cnt2)
    bale_size = jnp.where(app, rem, bale_size)
    bale_qual = jnp.where(app, q_int, bale_qual)
    merge = has_rem & ~big_rem & (cnt2 > 0)
    mm = sel & merge & (lanes == cnt2 - 1)
    bale_size = jnp.where(mm, bale_size + rem, bale_size)
    cnt3 = (cnt2 + jnp.where(own, I32(1), I32(0))).astype(I32)

    bale_cnt = jnp.where(pred & (jnp.arange(5) == m), cnt3, st.bale_cnt)
    return st._replace(bale_size=bale_size, bale_qual=bale_qual,
                       bale_cnt=bale_cnt)


def _check_press_status(cfg: SimConfig, st: FastEnvState) -> FastEnvState:
    for p in range(2):
        busy = st.press_timer[p] > 0
        timer = jnp.where(busy, st.press_timer[p] - 1, st.press_timer[p])
        done = busy & (timer == 0)
        st = _press_bale(cfg, st, st.press_mat[p], st.press_n[p],
                         st.press_q[p], done)
        st = st._replace(
            press_timer=st.press_timer.at[p].set(timer),
            press_mat=st.press_mat.at[p].set(jnp.where(done, 0, st.press_mat[p])),
            press_n=st.press_n.at[p].set(jnp.where(done, 0, st.press_n[p])),
            press_q=st.press_q.at[p].set(jnp.where(done, 0.0, st.press_q[p])),
        )
    return st


def _container_level(st: FastEnvState, m):
    return jnp.where(
        m < 4, st.cont_true[m] + st.cont_false[jnp.minimum(m, 3)],
        st.cont_true[4])


def _use_press(cfg: SimConfig, st: FastEnvState, press, m,
               pred) -> FastEnvState:
    """Load a press (predicated): touches only the leaves it modifies."""
    p = press - 1
    busy = st.press_timer[p] > 0
    go = pred & ~busy
    total = _container_level(st, m)
    true_m = jnp.where(m < 4, st.cont_true[m], total)
    quality = jnp.where(
        (m < 4) & (total > 0),
        true_m.astype(F32) / jnp.maximum(total, 1).astype(F32), 0.0)
    press_time = jnp.where(press == 1, cfg.press_time_1,
                           cfg.press_time_2).astype(I32)
    clear_true = go & (jnp.arange(5) == m)
    clear_false = go & (m < 4) & (jnp.arange(4) == jnp.minimum(m, 3))
    return st._replace(
        last_press_started=st.last_press_started | go,
        last_press_amount=jnp.where(go, total, st.last_press_amount).astype(I32),
        cont_true=jnp.where(clear_true, 0, st.cont_true),
        cont_false=jnp.where(clear_false, 0, st.cont_false),
        press_timer=st.press_timer.at[p].set(
            jnp.where(go, press_time, st.press_timer[p])),
        press_mat=st.press_mat.at[p].set(
            jnp.where(go, m, st.press_mat[p])),
        press_n=st.press_n.at[p].set(
            jnp.where(go, total, st.press_n[p]).astype(I32)),
        press_q=st.press_q.at[p].set(
            jnp.where(go, quality, st.press_q[p])),
    )


def _press_action_rules(cfg: SimConfig, st: FastEnvState, press_id, m):
    st = _check_press_status(cfg, st)
    return _use_press(cfg, st, jnp.maximum(press_id, 1), m, press_id != 0)


def _validate_press(cfg: SimConfig, st: FastEnvState, press_id, m):
    """Sanitize semantics (reference env_super.py:811-836): no-op always
    valid; otherwise the press must be idle and the container must hold
    >= balesize."""
    busy = jnp.where(
        press_id == 1, st.press_timer[0] > 0,
        jnp.where(press_id == 2, st.press_timer[1] > 0, False))
    level = _container_level(st, m)
    ok = (~busy) & (level >= cfg.effective_balesize)
    return jnp.where(press_id == 0, True, ok)


def press_action_masks(cfg: SimConfig, st: FastEnvState):
    levels = jnp.concatenate(
        [st.cont_true[:4] + st.cont_false, st.cont_true[4:5]])
    enough = levels >= cfg.effective_balesize
    p1 = st.press_timer[0] == 0
    p2 = st.press_timer[1] == 0
    return jnp.concatenate([jnp.ones(1, bool), enough & p1, enough & p2])


def monolith_action_masks(cfg: SimConfig, st: FastEnvState):
    m = press_action_masks(cfg, st)
    return jnp.concatenate([m, m])


def _sorting_rules(st: FastEnvState):
    c = st.belt_counts
    return jnp.where(c[0] + c[2] > c[1] + c[3], 0, 1).astype(I32)


def _check_container_level(cfg: SimConfig, st: FastEnvState):
    free1 = st.press_timer[0] == 0
    free2 = st.press_timer[1] == 0
    free_press = jnp.where(free1, 1, jnp.where(free2, 2, 0)).astype(I32)
    levels_ad = st.cont_true[:4] + st.cont_false
    best_ad = jnp.argmax(levels_ad)
    best_lvl = levels_ad[best_ad]
    lvl_e = st.cont_true[4]
    best_idx = jnp.where(lvl_e > best_lvl, 4, best_ad).astype(I32)
    best_lvl = jnp.maximum(best_lvl, lvl_e)
    ok = (free_press > 0) & (best_lvl > 0)
    return jnp.where(ok, free_press, 0), jnp.where(ok, best_idx, 0)


def _container_purities(cfg: SimConfig, st: FastEnvState):
    total = st.cont_true[:4] + st.cont_false
    purity = st.cont_true[:4].astype(F32) / jnp.maximum(total, 1).astype(F32)
    return jnp.where(total > 0, purity, F32(cfg.quality_threshold))


def get_sort_obs(cfg: SimConfig, st: FastEnvState):
    total = st.belt_counts.sum()
    props = jnp.where(total > 0,
                      st.belt_counts.astype(F32) / total.astype(F32), 0.0)
    diffs = _container_purities(cfg, st) - F32(cfg.quality_threshold)
    obs = jnp.concatenate([st.belt_occupancy[None], props, st.acc_belt, diffs])
    return jnp.clip(obs, -1.0, 1.0)


def get_press_obs(cfg: SimConfig, st: FastEnvState):
    cap = F32(cfg.container_capacity)
    levels = jnp.concatenate(
        [st.cont_true[:4] + st.cont_false, st.cont_true[4:5]]).astype(F32) / cap
    sorter = st.sort_counts.astype(F32) / F32(cfg.stage_capacity)
    timers = st.press_timer.astype(F32) / jnp.array(
        [cfg.press_time_1, cfg.press_time_2], F32)
    return jnp.clip(jnp.concatenate([levels, levels, sorter, timers]), 0.0, 1.0)


def get_mono_obs(cfg: SimConfig, st: FastEnvState):
    return jnp.concatenate([get_sort_obs(cfg, st), get_press_obs(cfg, st)])


def _sorting_reward(cfg: SimConfig, st: FastEnvState):
    purities = _container_purities(cfg, st)
    score = jnp.sum(purities - F32(cfg.purity_threshold_theta))
    raw = (score / 4.0) * F32(cfg.purity_scaling_factor)
    return jnp.tanh(raw / F32(cfg.tanh_temperature))


def _press_reward(cfg: SimConfig, st: FastEnvState):
    cap = F32(cfg.container_capacity)
    levels = jnp.concatenate(
        [st.cont_true[:4] + st.cont_false, st.cont_true[4:5]]).astype(F32)
    fill = levels / cap
    catastrophic = jnp.any(fill > 1.0)
    max_penalty = jnp.where(
        jnp.any(fill > 0.95), F32(cfg.overflow_penalty_severe),
        jnp.where(jnp.any(fill > 0.90), F32(cfg.overflow_penalty_mild), 0.0))
    overall = levels.sum() / (5.0 * cap)
    state_reward = overall * F32(cfg.max_state_reward)
    bs = cfg.effective_balesize
    amount = st.last_press_amount
    num_bales = amount // bs
    rem = amount % bs
    dist = jnp.minimum(rem, bs - rem)
    bef = F32(cfg.bale_efficiency_factor)
    efficiency = (1.0 - 4.0 * (dist.astype(F32) / F32(bs))) * bef
    peaks = jnp.array([0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0], F32)
    action_reward = jnp.where(
        st.last_press_started,
        efficiency + (peaks[jnp.minimum(num_bales, 3)] - bef), 0.0)
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


def _finish(cfg: SimConfig, st: FastEnvState):
    st = st._replace(current_step=st.current_step + 1)
    return st, st.current_step >= cfg.max_steps


def _apply_sort(cfg, st, sort_mode):
    st = st._replace(sensor_setting=jnp.asarray(sort_mode, I32))
    st = _update_accuracy(cfg, st)
    return _sort_material(cfg, st)


def _sample_masked_press(cfg, st):
    """Uniform masked press pick — the log-free uniform-rank recipe
    shared with fastb.masked_uniform_choice so the fused step kernel can
    replicate the draw bitwise (see that docstring); consumes one split
    + one f32 uniform from the key chain."""
    from . import fastb as FB

    mask = press_action_masks(cfg, st)
    key, sk = jax.random.split(st.key)
    a = FB.masked_uniform_choice(mask, jax.random.uniform(sk, dtype=F32))
    press_id = jnp.where(a == 0, 0, jnp.where(a <= 5, 1, 2)).astype(I32)
    mat = jnp.where(a == 0, 0, (a - 1) % 5).astype(I32)
    return press_id, mat, st._replace(key=key)


# ---------------------------------------------------------------------------
# Variant steps
# ---------------------------------------------------------------------------

def step_sort(cfg: SimConfig, st: FastEnvState, action):
    st = _update_environment(cfg, st)
    purity, st = _apply_sort(cfg, st, action)
    press_id, mat, st = _sample_masked_press(cfg, st)
    st = _press_action_rules(cfg, st, press_id, mat)
    reward = _sorting_reward(cfg, st)
    obs = get_sort_obs(cfg, st)
    st, terminated = _finish(cfg, st)
    return st, FastStepOut(obs, reward, terminated,
                           jnp.asarray(action, I32), reward,
                           jnp.zeros((), F32), purity)


def step_press(cfg: SimConfig, st: FastEnvState, action, sort_policy=None,
               use_action_masking: bool = True):
    st = _update_environment(cfg, st)
    if sort_policy is not None:
        apply_fn, params = sort_policy
        sort_mode = jnp.argmax(apply_fn(params, get_sort_obs(cfg, st))).astype(I32)
    else:
        sort_mode = _sorting_rules(st)
    purity, st = _apply_sort(cfg, st, sort_mode)
    a = jnp.asarray(action, I32)
    press_id = jnp.where(a == 0, 0, jnp.where(a <= 5, 1, 2)).astype(I32)
    mat = jnp.where(a == 0, 0, (a - 1) % 5).astype(I32)
    if not use_action_masking:
        # invalid actions become no-ops (timers still tick, env_2_press.py:138)
        valid = _validate_press(cfg, st, press_id, mat)
        press_id = jnp.where(valid, press_id, 0).astype(I32)
        mat = jnp.where(valid, mat, 0).astype(I32)
    st = _press_action_rules(cfg, st, press_id, mat)
    reward, st = _press_reward(cfg, st)
    obs = get_press_obs(cfg, st)
    st, terminated = _finish(cfg, st)
    return st, FastStepOut(obs, reward, terminated, a,
                           jnp.zeros((), F32), reward, purity)


def step_mono_external(cfg: SimConfig, st: FastEnvState, action,
                       use_action_masking: bool = True):
    st = _update_environment(cfg, st)
    a = jnp.asarray(action, I32)
    sort_mode = a // 11
    press_disc = a % 11
    purity, st = _apply_sort(cfg, st, sort_mode)
    press_id = jnp.where(press_disc == 0, 0,
                         jnp.where(press_disc <= 5, 1, 2)).astype(I32)
    mat = jnp.where(press_disc == 0, 0, (press_disc - 1) % 5).astype(I32)
    if not use_action_masking:
        # invalid external action: skip the press dispatch entirely,
        # timers frozen (the reference quirk, env_monolith.py:237-243)
        valid = _validate_press(cfg, st, press_id, mat)
        dispatched = _press_action_rules(cfg, st, press_id, mat)
        st = jax.tree.map(lambda a_, b_: jnp.where(valid, b_, a_),
                          st, dispatched)
    else:
        st = _press_action_rules(cfg, st, press_id, mat)
    sr = _sorting_reward(cfg, st)
    pr, st = _press_reward(cfg, st)
    obs = get_mono_obs(cfg, st)
    st, terminated = _finish(cfg, st)
    return st, FastStepOut(obs, sr + pr, terminated, a, sr, pr, purity)


def step_mono_rule(cfg: SimConfig, st: FastEnvState):
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
    return st, FastStepOut(obs, sr + pr, terminated, flat, sr, pr, purity)


def step_mono_model(cfg: SimConfig, st: FastEnvState, sort_policy=None,
                    press_policy=None, use_action_masking: bool = True):
    """Per-env counterpart of fastb.step_mono_model (reference mode='model',
    env_monolith.py:186-222): deterministic modular predictions on the
    post-update pre-sort state, random fallbacks from the threefry key."""
    st = _update_environment(cfg, st)

    def draw(logits):
        nonlocal st
        key, sk = jax.random.split(st.key)
        st = st._replace(key=key)
        return jax.random.categorical(sk, logits).astype(I32)

    if sort_policy is not None:
        apply_fn, params = sort_policy
        sort_mode = jnp.argmax(apply_fn(params, get_sort_obs(cfg, st)),
                               axis=-1).astype(I32)
    else:
        sort_mode = draw(jnp.zeros(2, F32))
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
        press_disc = draw(jnp.zeros(11, F32))
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
    return st, FastStepOut(obs, sr + pr, terminated, a_flat, sr, pr, purity)


def step_mono_random(cfg: SimConfig, st: FastEnvState,
                     use_action_masking: bool = True):
    """Per-env counterpart of fastb.step_mono_random (reference
    mode='random', env_monolith.py:152-164; threefry, not the legacy
    MT19937 — distribution-equivalent only)."""
    st = _update_environment(cfg, st)
    key, sk = jax.random.split(st.key)
    st = st._replace(key=key)
    if use_action_masking:
        mask = monolith_action_masks(cfg, st)
        a = jax.random.categorical(
            sk, jnp.where(mask, 0.0, -jnp.inf)).astype(I32)
    else:
        a = jax.random.categorical(sk, jnp.zeros(22, F32)).astype(I32)
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
    return st, FastStepOut(obs, sr + pr, terminated, a, sr, pr, purity)


def autoreset(cfg: SimConfig, st: FastEnvState) -> FastEnvState:
    fresh = reset(cfg, st.key)
    return fresh._replace(total_input_units=jnp.zeros((), I32))


def with_autoreset(cfg: SimConfig, step_fn):
    def stepped(st, action):
        st, out = step_fn(cfg, st, action)
        fresh = autoreset(cfg, st)
        st = jax.tree.map(lambda a, b: jnp.where(out.terminated, b, a),
                          st, fresh)
        return st, out
    return stepped
