"""Pure-functional dynamics of the sorting plant, bit-exact vs the
reference ``src/envs_train/env_super.py`` and
``utils/input_generator.py``.

Every function maps ``(cfg, EnvState, ...) -> (..., EnvState)`` with no
side effects; all reference mutations of ``self`` become functional
updates.  Data-dependent Python control flow of the reference becomes
``lax.while_loop``/``where`` with *identical RNG consumption*: an
iteration the reference skips consumes no draws here either.

All arithmetic runs in f64/i32 with NumPy-identical operation order so
results are bit-exact (verified by golden-trajectory tests against the
actual reference implementation).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import rng as R
from .state import EnvState
from ..config.config import SimConfig

I32 = jnp.int32
F64 = jnp.float64

# Seasonal pattern ratios in material order A,B,C,D
# (utils/input_generator.py:17-20; dict key 1 row 0, key 2 row 1).
# Built lazily: this module may be imported with x64 still off (the fast
# engine path), and a module-level f64 constant would silently truncate.
def _patterns():
    return jnp.array(
        [[0.40, 0.15, 0.35, 0.10],
         [0.15, 0.40, 0.10, 0.35]],
        F64,
    )


# ---------------------------------------------------------------------------
# Python-round semantics
# ---------------------------------------------------------------------------

def py_round2(x, z):
    """Python ``round(x, 2)``: correctly rounded decimal, half-to-even,
    reproducing CPython's ``double_round``.  ``np.round(x, 2)`` is *not*
    equivalent (it rounds the already-rounded product ``x*100``; e.g.
    ``round(1/40, 2)`` is 0.03 in Python but 0.02 via scaled rint).

    Implementation is exact integer arithmetic on the IEEE bit pattern:
    with |x| = m * 2^E (m the 53-bit significand), the correctly rounded
    decimal is k/100 with k = round_half_even(m * 100 * 2^E) computed from
    the exact integer m*100 (< 2^60, no overflow) and a shift — no float
    products, hence immune to the backend's FMA contraction.  Valid for
    |x| < 2^52 (the reference only rounds values in [-1, 400]).  Used for
    every ``round(..., 2)`` site of the reference (occupancy, purities,
    qualities, purity diffs).

    ``z`` is the runtime rounding fence (``PCG64State.fence``): XLA folds
    the final division by the constant 100 into a reciprocal multiply
    (different rounding), so the divisor is fenced."""
    x = jnp.asarray(x, F64)
    U64 = jnp.uint64
    neg = x < 0.0
    bits = jax.lax.bitcast_convert_type(jnp.abs(x), U64)
    e_biased = (bits >> U64(52)) & U64(0x7FF)
    frac = bits & U64((1 << 52) - 1)
    is_sub = e_biased == U64(0)
    m = jnp.where(is_sub, frac, frac | U64(1 << 52))
    # |x| = m * 2^E with E = e_biased - 1075 (subnormal: E = -1074)
    E = jnp.where(is_sub, jnp.int64(-1074), e_biased.astype(jnp.int64) - 1075)
    M = m * U64(100)  # exact: m < 2^53, M < 2^60
    shift = (-E).astype(jnp.int64)
    # shift <= 0 cannot occur for |x| < 2^52; shift >= 64 => value < 2^-4 => k = 0
    big = shift >= 64
    sh = jnp.clip(shift, 1, 63).astype(U64)
    int_part = M >> sh
    frac_part = M & ((U64(1) << sh) - U64(1))
    half = U64(1) << (sh - U64(1))
    round_up = (frac_part > half) | ((frac_part == half) & (int_part & U64(1) == U64(1)))
    k = jnp.where(big, U64(0), int_part + round_up.astype(U64))
    out = R.fdiv(k.astype(F64), F64(100.0), z)
    return jnp.where(neg, -out, out)


def np_round2(x, z):
    """``round(np.float64(x), 2)`` — NumPy scalar ``__round__`` semantics:
    ``rint(x*100)/100`` (scaled, half-to-even on the *rounded product*).

    This differs from CPython's float round: e.g. for x = 370/400 the
    double is just above 0.925, CPython rounds to 0.93, but x*100 rounds to
    exactly 92.5 and rint gives 92 -> 0.92.  The reference's containers are
    np.int64 (they accumulate numpy arrays), so every purity/quality
    ``round(...)`` in the reference goes through np.float64.__round__ and
    needs THESE semantics; only the input-occupancy round stays on pure
    Python ints/floats (py_round2)."""
    x = jnp.asarray(x, F64)
    return R.fdiv(jnp.rint(x * F64(100.0)), F64(100.0), z)


def py_round_int(x):
    """Python ``round(float)`` -> int (half-to-even), as in
    ``int(round(target_amount * acc))`` (env_super.py:539)."""
    return jnp.rint(jnp.asarray(x, F64)).astype(I32)


# ---------------------------------------------------------------------------
# Input generation (SeasonalInputGenerator.generate_input,
# utils/input_generator.py:37-64)
# ---------------------------------------------------------------------------

def generate_input(cfg: SimConfig, st: EnvState) -> Tuple[jax.Array, EnvState]:
    """One batch: pattern switch every ``steps_per_pattern`` calls, floor
    allocation, remainder assigned one unit at a time to a uniformly chosen
    material, then a full Fisher-Yates shuffle *consumed* (order never
    reaches the dynamics, only counts do — but the draws must advance the
    stream).  Returns per-material counts (i32[4])."""
    bs = cfg.input_batch_size

    switch = st.gen_step_counter >= cfg.steps_per_pattern
    pattern_idx = jnp.where(switch, (st.gen_pattern_idx + 1) % 2, st.gen_pattern_idx)
    step_counter = jnp.where(switch, 0, st.gen_step_counter)

    key = st.gen_pattern_seq[pattern_idx]  # 1 or 2
    ratios = _patterns()[key - 1]
    units = jnp.floor(ratios * F64(bs)).astype(I32)
    remainder = I32(bs) - units.sum()

    def cond(c):
        k, units, g = c
        return jnp.any(k < remainder)

    def body(c):
        k, units, g = c
        active = k < remainder
        m, g2 = R.choice_n(g, 4)
        units2 = units.at[m].add(I32(1))
        g3 = jax.tree.map(lambda a, b: jnp.where(active, b, a), g, g2)
        return (
            jnp.where(active, k + 1, k),
            jnp.where(active, units2, units),
            g3,
        )

    _, units, gen_rng = lax.while_loop(cond, body, (I32(0), units, st.gen_rng))
    gen_rng = R.shuffle_consume(gen_rng, bs)

    st = st._replace(
        gen_pattern_idx=pattern_idx,
        gen_step_counter=step_counter + 1,
        gen_rng=gen_rng,
    )
    return units, st


# ---------------------------------------------------------------------------
# Material flow (env_super.py:433-463) + input rule (env_super.py:911-922)
# ---------------------------------------------------------------------------

def input_action_rules(cfg: SimConfig, st: EnvState) -> EnvState:
    """Draws occupancy from rng_input; the value is unused by the dynamics
    but the stream must advance (env_super.py:911-922)."""
    _, rng_input = R.integers(
        st.rng_input, cfg.input_occupancy_min, cfg.input_occupancy_max + 1
    )
    return st._replace(rng_input=rng_input)


def update_environment(cfg: SimConfig, st: EnvState) -> EnvState:
    """sorting <- belt <- input <- fresh batch; occupancy bookkeeping;
    one-step accuracy delay (env_super.py:433-463)."""
    st = st._replace(
        sort_counts=st.belt_counts,
        belt_counts=st.input_counts,
        belt_occupancy=st.input_occupancy,
    )
    counts, st = generate_input(cfg, st)
    z = st.rng.fence
    occupancy = py_round2(R.fdiv(counts.sum().astype(F64), F64(100.0), z), z)
    return st._replace(
        input_counts=counts,
        input_occupancy=occupancy,
        acc_sorter=st.acc_belt,
        total_input_units=(st.total_input_units + counts.sum()).astype(I32),
    )


# ---------------------------------------------------------------------------
# Sorting machine (env_super.py:469-609)
# ---------------------------------------------------------------------------

def sorting_rules(st: EnvState) -> jax.Array:
    """Rule-based sort mode: boost the dominant pair (env_super.py:469-482).
    Empty belt gives mode 1 (0 > 0 is False)."""
    total = st.belt_counts.sum()
    props = jnp.where(
        total > 0, st.belt_counts.astype(F64) / total.astype(F64), 0.0
    )
    return jnp.where(props[0] + props[2] > props[1] + props[3], 0, 1).astype(I32)


def update_accuracy(cfg: SimConfig, st: EnvState) -> EnvState:
    """Boost the selected pair, add 4 sequential uniform noise draws,
    clip to [0,1] (env_super.py:492-509).  The reference draws
    ``uniform(-noise, +noise, 4)`` — an array fill consuming 4 doubles in
    index order."""
    base = jnp.asarray(cfg.baseline_accuracy, F64)
    boost_ac = jnp.array([cfg.boost, 0.0, cfg.boost, 0.0], F64)
    boost_bd = jnp.array([0.0, cfg.boost, 0.0, cfg.boost], F64)
    acc = base + jnp.where(st.sensor_setting == 0, boost_ac,
                           jnp.where(st.sensor_setting == 1, boost_bd, 0.0))
    n = cfg.effective_noise
    g = st.rng_noise
    noise = []
    for _ in range(4):
        v, g = R.uniform(g, -n, n)
        noise.append(v)
    acc = jnp.clip(acc + jnp.stack(noise), 0.0, 1.0)
    return st._replace(acc_belt=acc, rng_noise=g)


def sort_material(cfg: SimConfig, st: EnvState) -> Tuple[jax.Array, EnvState]:
    """The hot loop (env_super.py:511-609): per station A..D compute
    true/false split with banker's rounding, then redistribute the false
    units one by one with probability proportional to current leftovers —
    one weighted ``choice`` draw per unit, data-dependent count, consuming
    the ``rng`` (seed+99) stream exactly like the reference.

    Returns the step's mean purity (f64)."""
    total_input = st.sort_counts.sum()
    leftover = st.sort_counts
    true_arr = jnp.zeros(4, I32)
    false_arr = jnp.zeros(4, I32)
    g = st.rng

    for i in range(4):  # static unroll over stations
        target = leftover[i]
        acc = st.acc_sorter[i]
        true_val = py_round_int(target.astype(F64) * acc)
        false_val = target - true_val
        true_arr = true_arr.at[i].set(true_val)
        false_arr = false_arr.at[i].set(false_val)
        leftover = leftover.at[i].set(false_val)

        def cond(c):
            k, leftover, g = c
            return jnp.any((k < false_val) & (leftover.sum() > 0))

        def body(c):
            k, leftover, g = c
            active = (k < false_val) & (leftover.sum() > 0)
            total = leftover.sum()
            pvals = leftover.astype(F64) / jnp.maximum(total, 1).astype(F64)
            sel, g2 = R.choice_p(g, pvals)
            leftover2 = leftover.at[sel].add(I32(-1))
            g3 = jax.tree.map(lambda a, b: jnp.where(active, b, a), g, g2)
            return (
                jnp.where(active, k + 1, k),
                jnp.where(active, leftover2, leftover),
                g3,
            )

        _, leftover, g = lax.while_loop(cond, body, (I32(0), leftover, g))

    e_input = leftover.sum()
    total_output = true_arr.sum() + false_arr.sum() + e_input
    discrepancy = total_input - total_output
    e_input = (e_input + jnp.clip(discrepancy, -1, 1)).astype(I32)
    err = jnp.where(jnp.abs(discrepancy) > 1, I32(1), I32(0))

    cont_true = st.cont_true.at[:4].add(true_arr)
    cont_true = cont_true.at[4].add(e_input)
    cont_false = st.cont_false + false_arr

    mean_purity = jnp.where(
        total_input > 0,
        np_round2(
            1.0
            - (total_input - true_arr.sum()).astype(F64)
            / jnp.maximum(total_input, 1).astype(F64),
            g.fence,
        ),
        0.0,
    )

    st = st._replace(
        cont_true=cont_true,
        cont_false=cont_false,
        rng=g,
        error_flag=(st.error_flag + err).astype(I32),
    )
    return mean_purity, st


# ---------------------------------------------------------------------------
# Presses & bales (env_super.py:626-769)
# ---------------------------------------------------------------------------

def _press_bale(cfg: SimConfig, st: EnvState, m, n, q) -> EnvState:
    """env_super.py:661-687: emit n//balesize full bales of (balesize,
    int(q*100)); a remainder greater than threshold*balesize becomes its
    own bale, otherwise merges into the *last* bale (or opens one if the
    material's list is empty).  ``int(q*100)`` truncates toward zero on the
    same f64 product as CPython."""
    bs = cfg.effective_balesize
    q_int = (q * F64(100.0)).astype(I32)
    full = n // bs
    rem = n % bs

    row_size = st.bale_size[m]
    row_qual = st.bale_qual[m]
    cnt = st.bale_cnt[m]

    idx = jnp.arange(cfg.max_bales, dtype=I32)
    new_mask = (idx >= cnt) & (idx < cnt + full)
    row_size = jnp.where(new_mask, bs, row_size)
    row_qual = jnp.where(new_mask, q_int, row_qual)
    cnt = (cnt + full).astype(I32)

    big_rem = rem.astype(F64) > F64(bs) * F64(cfg.bale_remainder_threshold)
    has_rem = rem > 0

    # own bale (rem > threshold, or list empty)
    own = has_rem & (big_rem | (cnt == 0))
    app_mask = own & (idx == cnt)
    row_size = jnp.where(app_mask, rem, row_size)
    row_qual = jnp.where(app_mask, q_int, row_qual)
    # merge into last bale
    merge = has_rem & ~big_rem & (cnt > 0)
    merge_mask = merge & (idx == cnt - 1)
    row_size = jnp.where(merge_mask, row_size + rem, row_size)
    cnt = (cnt + jnp.where(own, I32(1), I32(0))).astype(I32)

    return st._replace(
        bale_size=st.bale_size.at[m].set(row_size),
        bale_qual=st.bale_qual.at[m].set(row_qual),
        bale_cnt=st.bale_cnt.at[m].set(cnt),
    )


def check_press_status(cfg: SimConfig, st: EnvState) -> EnvState:
    """Decrement busy press timers; on reaching zero, bale out and clear
    (env_super.py:642-659).  Press 1 strictly before press 2 (bale append
    order matters when both finish the same step)."""
    for p in range(2):
        busy = st.press_timer[p] > 0
        timer = jnp.where(busy, st.press_timer[p] - 1, st.press_timer[p])
        done = busy & (timer == 0)

        baled = _press_bale(cfg, st, st.press_mat[p], st.press_n[p], st.press_q[p])
        st = jax.tree.map(lambda a, b: jnp.where(done, b, a), st, baled)
        st = st._replace(
            press_timer=st.press_timer.at[p].set(timer),
            press_mat=st.press_mat.at[p].set(jnp.where(done, 0, st.press_mat[p])),
            press_n=st.press_n.at[p].set(jnp.where(done, 0, st.press_n[p])),
            press_q=st.press_q.at[p].set(jnp.where(done, 0.0, st.press_q[p])),
        )
    return st


def _container_level(st: EnvState, m) -> jax.Array:
    """A..D: true+false; E: true only (env_super.py:739-742)."""
    return jnp.where(
        m < 4,
        st.cont_true[m] + st.cont_false[jnp.minimum(m, 3)],
        st.cont_true[4],
    )


def use_press(cfg: SimConfig, st: EnvState, press, m) -> Tuple[jax.Array, EnvState]:
    """env_super.py:722-769.  ``press`` is 1 or 2 (traced), ``m`` is 0..4.
    Returns an action-log code (i32): the discrete action if executed,
    111/222 if the press was busy."""
    p = press - 1
    busy = st.press_timer[p] > 0

    total = _container_level(st, m)
    true_m = jnp.where(m < 4, st.cont_true[m], total)
    quality = jnp.where(
        (m < 4) & (total > 0),
        np_round2(true_m.astype(F64) / jnp.maximum(total, 1).astype(F64),
                  st.rng.fence),
        0.0,
    )

    press_time = jnp.where(press == 1, cfg.press_time_1,
                           cfg.press_time_2).astype(I32)
    started = st._replace(
        last_press_started=jnp.ones_like(st.last_press_started),
        last_press_amount=total.astype(I32),
        cont_true=st.cont_true.at[m].set(0),
        cont_false=jnp.where(
            (m < 4) & (jnp.arange(4) == jnp.minimum(m, 3)), 0, st.cont_false
        ),
        press_timer=st.press_timer.at[p].set(press_time),
        press_mat=st.press_mat.at[p].set(m),
        press_n=st.press_n.at[p].set(total.astype(I32)),
        press_q=st.press_q.at[p].set(quality),
    )
    blocked = st._replace(press_penalty_flag=jnp.ones_like(st.press_penalty_flag))
    st = jax.tree.map(lambda a, b: jnp.where(busy, a, b), blocked, started)
    code = jnp.where(busy, jnp.where(press == 1, 111, 222), (press - 1) * 5 + m + 1)
    return code.astype(I32), st


def press_action_rules(cfg: SimConfig, st: EnvState, press_id, m) -> Tuple[jax.Array, EnvState]:
    """env_super.py:626-640: tick press timers (always), then dispatch.
    ``press_id`` 0 means no-op.  Returns action-log code (0 for no-op)."""
    st = check_press_status(cfg, st)
    code, used = use_press(cfg, st, jnp.maximum(press_id, 1), m)
    noop = press_id == 0
    st = jax.tree.map(lambda a, b: jnp.where(noop, a, b), st, used)
    return jnp.where(noop, 0, code).astype(I32), st


def check_container_level(cfg: SimConfig, st: EnvState) -> Tuple[jax.Array, jax.Array]:
    """Rule-based pressing (env_super.py:689-720): first free press x
    fullest non-empty container (ties -> earliest of A..D; E only if
    strictly fuller).  Returns (press_id, mat_idx) with press_id 0 for
    none."""
    free1 = st.press_timer[0] == 0
    free2 = st.press_timer[1] == 0
    free_press = jnp.where(free1, 1, jnp.where(free2, 2, 0)).astype(I32)

    levels_ad = st.cont_true[:4] + st.cont_false
    best_ad = jnp.argmax(levels_ad)  # first max (ties -> lowest index)
    best_lvl = levels_ad[best_ad]
    lvl_e = st.cont_true[4]
    best_idx = jnp.where(lvl_e > best_lvl, 4, best_ad).astype(I32)
    best_lvl = jnp.maximum(best_lvl, lvl_e)

    ok = (free_press > 0) & (best_lvl > 0)
    return jnp.where(ok, free_press, 0), jnp.where(ok, best_idx, 0)


def press_action_masks(cfg: SimConfig, st: EnvState) -> jax.Array:
    """Length-11 bool mask (env_super.py:869-885): index 0 always valid;
    (press p, container c) valid iff press idle and level >= balesize."""
    levels = jnp.concatenate(
        [st.cont_true[:4] + st.cont_false, st.cont_true[4:5]]
    )
    enough = levels >= cfg.effective_balesize
    p1 = st.press_timer[0] == 0
    p2 = st.press_timer[1] == 0
    return jnp.concatenate(
        [jnp.ones(1, bool), enough & p1, enough & p2]
    )


def monolith_action_masks(cfg: SimConfig, st: EnvState) -> jax.Array:
    m = press_action_masks(cfg, st)
    return jnp.concatenate([m, m])


def sample_masked_press_action(cfg: SimConfig, st: EnvState) -> Tuple[jax.Array, jax.Array, EnvState]:
    """env_super.py:291-300: uniform choice over valid discrete actions via
    rng_pressing (mask[0] is always True so there is always >= 1 draw...
    unless only one action is valid, in which case NumPy's
    ``integers(0, 1)`` consumes nothing).  Returns (press_id, mat_idx)."""
    mask = press_action_masks(cfg, st)
    n_valid = mask.sum().astype(I32)
    k, rng_pressing = R._lemire32(st.rng_pressing, (n_valid - 1).astype(jnp.uint32))
    # index of the (k+1)-th True entry
    csum = jnp.cumsum(mask.astype(I32))
    a_disc = jnp.argmax(csum == (k.astype(I32) + 1)).astype(I32)
    press_id = jnp.where(a_disc == 0, 0, jnp.where(a_disc <= 5, 1, 2)).astype(I32)
    mat = jnp.where(a_disc == 0, 0, (a_disc - 1) % 5).astype(I32)
    return press_id, mat, st._replace(rng_pressing=rng_pressing)


def press_discrete_to_action(a) -> Tuple[jax.Array, jax.Array]:
    """0 -> no-op; 1-5 -> press1 x A..E; 6-10 -> press2 x A..E
    (env_super.py:804-809)."""
    a = jnp.asarray(a, I32)
    press_id = jnp.where(a == 0, 0, jnp.where(a <= 5, 1, 2)).astype(I32)
    mat = jnp.where(a == 0, 0, (a - 1) % 5).astype(I32)
    return press_id, mat


def validate_press_action(cfg: SimConfig, st: EnvState, press_id, mat) -> jax.Array:
    """env_super.py:811-836: no-op always valid; press must be idle and the
    container must hold >= balesize."""
    busy = jnp.where(
        press_id == 1, st.press_timer[0] > 0,
        jnp.where(press_id == 2, st.press_timer[1] > 0, False),
    )
    level = _container_level(st, mat)
    ok = (~busy) & (level >= cfg.effective_balesize)
    return jnp.where(press_id == 0, True, ok)


def sanitize_press_action(cfg: SimConfig, st: EnvState, a) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """env_super.py:838-862: invalid actions become no-ops; returns
    (press_id, mat, was_invalid, invalid_code 111/222/0)."""
    press_id, mat = press_discrete_to_action(a)
    valid = validate_press_action(cfg, st, press_id, mat)
    code = jnp.where(
        valid, 0, jnp.where(press_id == 1, 111, jnp.where(press_id == 2, 222, 999))
    ).astype(I32)
    press_out = jnp.where(valid, press_id, 0).astype(I32)
    mat_out = jnp.where(valid, mat, 0).astype(I32)
    return press_out, mat_out, ~valid, code


def detect_overflow(cfg: SimConfig, st: EnvState) -> jax.Array:
    levels = jnp.concatenate(
        [st.cont_true[:4] + st.cont_false, st.cont_true[4:5]]
    )
    return jnp.any(levels > cfg.container_capacity)


# ---------------------------------------------------------------------------
# Observations (env_super.py:306-359) & purity helpers (:212-227, :771-791)
# ---------------------------------------------------------------------------

def container_purities(cfg: SimConfig, st: EnvState) -> jax.Array:
    """round(true/(true+false), 2) per A..D; empty -> quality threshold
    (env_super.py:771-791)."""
    total = st.cont_true[:4] + st.cont_false
    purity = np_round2(
        st.cont_true[:4].astype(F64) / jnp.maximum(total, 1).astype(F64),
        st.rng.fence,
    )
    return jnp.where(total > 0, purity, F64(cfg.quality_threshold))


def compute_purity_differences(cfg: SimConfig, st: EnvState) -> jax.Array:
    """round(purity - threshold, 2); negative diffs scaled by 1 (no-op)
    (env_super.py:212-227)."""
    return np_round2(
        container_purities(cfg, st) - F64(cfg.quality_threshold), st.rng.fence
    )


def get_sort_obs(cfg: SimConfig, st: EnvState) -> jax.Array:
    """13-dim f32 (env_super.py:306-325)."""
    total = st.belt_counts.sum()
    props = jnp.where(
        total > 0, st.belt_counts.astype(F64) / total.astype(F64), 0.0
    )
    obs = jnp.concatenate(
        [
            st.belt_occupancy[None],
            props,
            st.acc_belt,
            compute_purity_differences(cfg, st),
        ]
    ).astype(jnp.float32)
    return jnp.clip(obs, -1.0, 1.0)


def get_press_obs(cfg: SimConfig, st: EnvState) -> jax.Array:
    """16-dim f32 (env_super.py:327-359)."""
    z = st.rng.fence
    levels = R.fdiv(
        jnp.concatenate(
            [st.cont_true[:4] + st.cont_false, st.cont_true[4:5]]
        ).astype(F64),
        F64(cfg.container_capacity),
        z,
    )
    sorter = R.fdiv(st.sort_counts.astype(F64), F64(cfg.stage_capacity), z)
    timers = R.fdiv(
        st.press_timer.astype(F64),
        jnp.array([cfg.press_time_1, cfg.press_time_2], F64),
        z,
    )
    obs = jnp.concatenate([levels, levels, sorter, timers]).astype(jnp.float32)
    return jnp.clip(obs, 0.0, 1.0)


def get_mono_obs(cfg: SimConfig, st: EnvState) -> jax.Array:
    return jnp.concatenate([get_sort_obs(cfg, st), get_press_obs(cfg, st)])


# ---------------------------------------------------------------------------
# Rewards (env_super.py:963-1080)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _sorting_table(cfg: SimConfig):
    from . import reward_tables as RT

    try:
        return RT.build_sorting_table(cfg)
    except AssertionError:
        return None  # off-grid threshold: fall back to device tanh


def calculate_sorting_reward(cfg: SimConfig, st: EnvState) -> jax.Array:
    """tanh(mean(purity - theta) * 2.0 / 0.5) (env_super.py:963-1003).
    The score accumulates sequentially in material order, as the
    reference's ``+=`` loop does (f64 addition is order-sensitive).

    The final ``np.tanh`` is resolved through an exact host-built lookup
    table (``reward_tables.build_sorting_table``): the score set is
    finite (1770 values in the default config), so the reward is NumPy's
    own tanh output, bit-for-bit — no device transcendental."""
    purities = container_purities(cfg, st)
    diffs = purities - F64(cfg.purity_threshold_theta)
    score = ((diffs[0] + diffs[1]) + diffs[2]) + diffs[3]
    tab = _sorting_table(cfg)
    if tab is not None:
        k = jnp.searchsorted(jnp.asarray(tab.scores), score)
        k = jnp.clip(k, 0, tab.rewards.size - 1)
        return jnp.asarray(tab.rewards)[k]
    raw = (score / 4.0) * F64(cfg.purity_scaling_factor)
    return jnp.tanh(raw / F64(cfg.tanh_temperature))


def calculate_press_reward(cfg: SimConfig, st: EnvState) -> Tuple[jax.Array, EnvState]:
    """env_super.py:1006-1080.  Resets the last-press flags (the reference
    mutates them inside the reward), hence returns an updated state."""
    z = st.rng.fence
    levels = jnp.concatenate(
        [st.cont_true[:4] + st.cont_false, st.cont_true[4:5]]
    ).astype(F64)
    fill = R.fdiv(levels, F64(cfg.container_capacity), z)

    catastrophic = jnp.any(fill > 1.0)
    max_penalty = jnp.where(
        jnp.any(fill > 0.95),
        F64(cfg.overflow_penalty_severe),
        jnp.where(jnp.any(fill > 0.90), F64(cfg.overflow_penalty_mild), 0.0),
    )

    # reference sums integer levels then divides once (env_super.py:1040-1049)
    total_level = (
        st.cont_true[:4].sum() + st.cont_false.sum() + st.cont_true[4]
    ).astype(F64)
    overall = R.fdiv(total_level, F64(5 * cfg.container_capacity), z)
    state_reward = R.fmul(overall, F64(cfg.max_state_reward), st.rng.fence)

    bs = cfg.effective_balesize
    amount = st.last_press_amount
    num_bales = amount // bs
    rem = amount % bs
    dist = jnp.minimum(rem, bs - rem)
    bef = F64(cfg.bale_efficiency_factor)
    efficiency = R.fmul(
        1.0 - R.fmul(F64(4.0), R.fdiv(dist.astype(F64), F64(bs), z), z), bef, z
    )
    peaks = jnp.array([0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0], F64)
    bonus_idx = jnp.minimum(num_bales, 3)
    action_reward = jnp.where(
        st.last_press_started, efficiency + (peaks[bonus_idx] - bef), 0.0
    )

    normal = jnp.clip(state_reward + action_reward, -1.0, 1.0)
    reward = jnp.where(
        catastrophic,
        F64(cfg.overflow_penalty_catastrophic),
        jnp.where(max_penalty < 0.0, max_penalty, normal),
    )
    st = st._replace(
        last_press_started=jnp.where(
            catastrophic | (max_penalty < 0.0),
            st.last_press_started,
            jnp.zeros_like(st.last_press_started),
        ),
        last_press_amount=jnp.where(
            catastrophic | (max_penalty < 0.0), st.last_press_amount, 0
        ),
    )
    return reward, st
