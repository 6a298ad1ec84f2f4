"""TPU-exact dynamics overlay: bit-exact trajectories without trusting
hardware f64 (docs/EXACT32_DESIGN.md).

Reuses the parity engine's state machine (``dynamics.py`` — integer
plant, PCG64 streams) and replaces every computation whose result depends
on *hardware* f64 rounding with the integer soft-float kernel
(``softfloat.py``).  Covers both the benchmark configuration
``noise_sorting = 0`` (main.py:42) and the reference DEFAULT
``noise = 0.05`` (config.yml:18, drawn at env_super.py:508):

* ``choice(p=...)`` in the redistribution loop -> soft-float cdf pipeline
* the sorting true/false split -> exact banker's rounding of ``t*3/4``
  at noise 0 (accuracies exactly {0.75, 1.0}); at noise > 0 the full
  ``int(round(target * acc))`` via soft-float mul + half-even round
* the accuracy noise draw ``uniform(-n, +n, 4)`` (noise > 0) ->
  ``low + (high-low) * next_double`` with NumPy's separate mul/add
  roundings, then ``clip(base + noise, 0, 1)`` — all in integers; the
  exact f64 accuracies are carried as IEEE bit patterns in
  ``acc_belt_bits``/``acc_sorter_bits`` (TPU f64 is ~49-bit and cannot
  store them)
* occupancy / purity / quality round2 -> integer cents
* observations -> exact f32 from cents tables and soft-float divisions

State convention difference (documented): ``input_occupancy``,
``belt_occupancy`` and ``press_q`` store *cents* (e.g. 67.0 instead of
0.67) so that no stored f64 value carries information below the 49-bit
TPU precision.  ``to_parity_view`` converts for comparisons.

On CPU this engine must agree **bit-for-bit** with the parity engine
(tests); on TPU it is the engine that makes the BASELINE parity claim
hold on-device.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import dynamics as D
from . import rng as R
from . import softfloat as SF
from .state import EnvState
from ..config.config import SimConfig

I32 = jnp.int32
F32 = jnp.float32
U64 = jnp.uint64

# f32 lookup tables: index k -> np.float32(np.float64(k) / den).  Built by
# NumPy itself, so they are authoritative for the reference's f64->f32
# casts whatever the accelerator's float hardware does.
_T100 = jnp.asarray((np.arange(501, dtype=np.float64) / 100.0
                     ).astype(np.float32))
_T700 = jnp.asarray((np.arange(24001, dtype=np.float64) / 700.0
                     ).astype(np.float32))
_T12 = jnp.asarray((np.arange(13, dtype=np.float64) / 12.0
                    ).astype(np.float32))
_T15 = jnp.asarray((np.arange(16, dtype=np.float64) / 15.0
                    ).astype(np.float32))
# purity diffs: cents-90 in [-90, 10] -> f32((k-90)/100): reuse _T100 via
# sign split (f32(-x) == -f32(x) exactly)

# powers of two for the non-authoritative f64 view of soft-float values:
# jnp.ldexp's f64 frexp lowers to a 64-bit bitcast the TPU X64 rewriter
# rejects, so scale by an exact host-built 2^e table instead (exact on
# CPU; the TPU's ~49-bit f64 rounds the mantissa — view only).  Host
# numpy at module scope; converted lazily so importing this module never
# requires x64 (rng.require_x64 runs on first state creation).
_POW2_NP = np.ldexp(1.0, np.arange(-70, -39))


def _f64_view(m, e):
    tab = jnp.asarray(_POW2_NP, jnp.float64)
    idx = jnp.clip(e + I32(70), 0, tab.shape[0] - 1)
    return m.astype(jnp.float64) * tab[idx]


def _f32_cents(k):
    """f32 of k/100 from the table (k in [-500, 500], integer)."""
    neg = k < 0
    v = _T100[jnp.abs(k)]
    return jnp.where(neg, -v, v)


def choice_p_exact(g: R.PCG64State, avail) -> Tuple[jax.Array, R.PCG64State]:
    """Bit-exact ``Generator.choice(4, p=avail/total)`` without hardware
    f64 (replicates core.rng.choice_p's f64 decisions in integers)."""
    T = avail.sum().astype(I32)
    ps = [SF.sf_div_int(avail[j].astype(U64), T.astype(U64)) for j in range(4)]
    acc = ps[0]
    cdf = [acc]
    for j in range(1, 4):
        acc = SF.sf_add(acc, ps[j])
        cdf.append(acc)
    last = cdf[3]
    raw, g = R.next_uint64(g)
    u = raw >> U64(11)
    idx = jnp.zeros((), I32)
    for j in range(4):
        cn = SF.sf_div(cdf[j], last)
        idx = idx + SF.sf_cmp_le_u53(cn, u).astype(I32)
    return idx, g


def _split_counts(cfg: SimConfig, target, boosted):
    """true_val = int(round(target * acc)) with acc in {0.75, 1.0} — pure
    integers (env_super.py:539 at noise 0; 1.25 clips to 1.0)."""
    # acc = 3/4 when not boosted, 1 when boosted
    p = target.astype(jnp.int64) * 3
    q, r = p // 4, p % 4
    r2 = 2 * r
    up = (r2 > 4) | ((r2 == 4) & ((q & 1) == 1))
    t075 = (q + up.astype(jnp.int64)).astype(I32)
    return jnp.where(boosted, target, t075)


def _split_counts_bits(target, acc_bits):
    """true_val = int(round(target * acc)) for an arbitrary f64 accuracy
    carried as IEEE bits (the noise > 0 sorting split, env_super.py:539):
    exact int -> correctly-rounded f64 product -> Python half-even round,
    all in integers."""
    prod = SF.sf_mul(SF.sf_from_int(target), SF.sf_from_bits(acc_bits))
    return SF.sf_round_int(prod).astype(I32)


def sort_material_exact(cfg: SimConfig, st: EnvState) -> Tuple[jax.Array, EnvState]:
    """Exact-mode sort_material: integer split + exact weighted choice.
    Mean purity returned as *cents* (i32)."""
    total_input = st.sort_counts.sum()
    leftover = st.sort_counts
    true_arr = jnp.zeros(4, I32)
    false_arr = jnp.zeros(4, I32)
    g = st.rng
    # the sorter runs on the DELAYED accuracies (acc_sorter = previous
    # step's acc_belt, env_super.py:457): at noise 0 these are exactly
    # 0.75 (unboosted) or 1.0 (boosted+clipped); at noise > 0 the exact
    # f64 values live in acc_sorter_bits
    exact_noise = cfg.effective_noise != 0.0
    boost_mask = st.acc_sorter >= 0.875

    for i in range(4):
        target = leftover[i]
        if exact_noise:
            true_val = _split_counts_bits(target, st.acc_sorter_bits[i])
        else:
            true_val = _split_counts(cfg, target, boost_mask[i])
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
            sel, g2 = choice_p_exact(g, leftover)
            leftover2 = leftover.at[sel].add(I32(-1))
            g3 = jax.tree.map(lambda a, b: jnp.where(active, b, a), g, g2)
            return (
                jnp.where(active, k + 1, k),
                jnp.where(active, leftover2, leftover),
                g3,
            )

        _, leftover, g = lax.while_loop(cond, body, (I32(0), leftover, g))

    e_input = leftover.sum().astype(I32)
    cont_true = st.cont_true.at[:4].add(true_arr)
    cont_true = cont_true.at[4].add(e_input)

    # mean purity cents: np_round2(1 - (total-true)/total)
    ratio = SF.sf_div_int(
        (total_input - true_arr.sum()).clip(0).astype(U64),
        jnp.maximum(total_input, 1).astype(U64))
    purity_cents = jnp.where(
        total_input > 0, SF.sf_cents(SF.sf_sub_from_one(ratio)).astype(I32),
        I32(0))

    st = st._replace(cont_true=cont_true, cont_false=st.cont_false + false_arr,
                     rng=g)
    return purity_cents, st


@functools.lru_cache(maxsize=8)
def _acc_consts(cfg: SimConfig):
    """Host constants for the accuracy-noise pipeline (numpy only — see
    _sort_tab_exact's leaked-tracer note).  The reference builds
    ``accuracies`` with Python float adds and ``high - low`` with a C
    double subtraction (numpy Generator.uniform) — both replicated here
    on the host, bit-exactly."""
    from . import exact32_proto as P

    n = float(cfg.effective_noise)
    low = -n
    rng2 = P.sf_from_float(n - low)

    def sfs_const(v: float):
        s = P.sf_from_float(abs(v))
        sign = 0 if v == 0 else (1 if v > 0 else -1)
        return (np.int32(sign), np.uint64(s.m), np.int32(s.e))

    def clip_bits(v: float) -> np.uint64:
        return np.float64(min(max(v, 0.0), 1.0)).view(np.uint64)

    base = [float(b) for b in cfg.baseline_accuracy]
    boosted = [b + float(cfg.boost) for b in base]
    return (sfs_const(low), (np.uint64(rng2.m), np.int32(rng2.e)),
            tuple(sfs_const(v) for v in base),
            tuple(sfs_const(v) for v in boosted),
            tuple(clip_bits(v) for v in base),
            tuple(clip_bits(v) for v in boosted))


def _boosted_mask(sensor_setting, i: int):
    """Mode 0 boosts A & C (even stations), mode 1 boosts B & D
    (env_super.py:492-505); any other mode boosts nothing."""
    return jnp.where(sensor_setting == 0, (i % 2) == 0,
                     jnp.where(sensor_setting == 1, (i % 2) == 1, False))


def update_accuracy_exact(cfg: SimConfig, st: EnvState) -> EnvState:
    """Exact update_accuracy (env_super.py:492-509).

    noise = 0: the 4 uniform draws are consumed (stream parity) but the
    values are exactly 0; accuracies are {0.75, 1.0} after the clip.

    noise > 0: each draw is ``low + (high-low) * next_double`` with
    NumPy's separate mul/add roundings (rng.uniform), then
    ``clip(acc + noise, 0, 1)`` — all in the integer soft-float kernel,
    with the exact f64 values stored as IEEE bits in acc_belt_bits."""
    g = st.rng_noise
    (low_c, rng2_c, base_c, boost_c,
     base_bits, boost_bits) = _acc_consts(cfg)

    if cfg.effective_noise == 0.0:
        for _ in range(4):
            _, g = R.next_uint64(g)
        base = jnp.asarray(cfg.baseline_accuracy, jnp.float64)
        boost_ac = jnp.array([cfg.boost, 0.0, cfg.boost, 0.0], jnp.float64)
        boost_bd = jnp.array([0.0, cfg.boost, 0.0, cfg.boost], jnp.float64)
        acc = base + jnp.where(st.sensor_setting == 0, boost_ac,
                               jnp.where(st.sensor_setting == 1, boost_bd, 0.0))
        acc = jnp.clip(acc, 0.0, 1.0)
        bits = jnp.stack([
            jnp.where(_boosted_mask(st.sensor_setting, i),
                      jnp.asarray(boost_bits[i]), jnp.asarray(base_bits[i]))
            for i in range(4)])
        return st._replace(acc_belt=acc, acc_belt_bits=bits, rng_noise=g)

    low = SF.SFS(*map(jnp.asarray, low_c))
    rng2 = SF.SFJ(jnp.asarray(rng2_c[0]), jnp.asarray(rng2_c[1]))
    bits, f64v = [], []
    for i in range(4):
        raw, g = R.next_uint64(g)
        d = SF.sf_from_u53(raw >> U64(11))
        prod = SF.sf_mul(rng2, d)
        noise_v = SF.sfs_add(low, SF.sfs_of(prod))
        acc_c = _sfs_where(_boosted_mask(st.sensor_setting, i),
                           SF.SFS(*map(jnp.asarray, boost_c[i])),
                           SF.SFS(*map(jnp.asarray, base_c[i])))
        acc = SF.sfs_add(acc_c, noise_v)
        # np.clip(x, 0, 1): non-positive -> +0, above one -> 1.0
        nonpos = acc.s <= 0
        over = (acc.e > I32(-52)) | ((acc.e == I32(-52))
                                     & (acc.m > jnp.asarray(SF.MLOW)))
        m = jnp.where(nonpos, U64(0),
                      jnp.where(over, jnp.asarray(SF.MLOW), acc.m))
        e = jnp.where(nonpos, I32(0), jnp.where(over, I32(-52), acc.e))
        bits.append(SF.sf_to_bits(SF.SFJ(m, e)))
        # non-authoritative f64 view (exact on CPU, ~49-bit on TPU)
        f64v.append(_f64_view(m, e))
    return st._replace(acc_belt=jnp.stack(f64v),
                       acc_belt_bits=jnp.stack(bits), rng_noise=g)


def update_environment_exact(cfg: SimConfig, st: EnvState) -> EnvState:
    """Material flow with occupancy stored as cents."""
    st = st._replace(
        sort_counts=st.belt_counts,
        belt_counts=st.input_counts,
        belt_occupancy=st.input_occupancy,  # cents flow through
    )
    counts, st = D.generate_input(cfg, st)
    # occupancy cents: py_round2(k/100) == k cents for k <= 400 (tested)
    occupancy_cents = counts.sum().astype(jnp.float64)
    return st._replace(
        input_counts=counts,
        input_occupancy=occupancy_cents,
        acc_sorter=st.acc_belt,
        acc_sorter_bits=st.acc_belt_bits,
        total_input_units=(st.total_input_units + counts.sum()).astype(I32),
    )


def container_purity_cents(cfg: SimConfig, st: EnvState) -> jax.Array:
    """np_round2(true/(true+false)) in cents; empty -> threshold cents."""
    total = st.cont_true[:4] + st.cont_false
    cents = jax.vmap(
        lambda a, b: SF.sf_cents(SF.sf_div_int(a, b)))(
        st.cont_true[:4].astype(U64), jnp.maximum(total, 1).astype(U64)
    ).astype(I32)
    thr = I32(int(round(cfg.quality_threshold * 100)))
    return jnp.where(total > 0, cents, thr)


def get_sort_obs_exact(cfg: SimConfig, st: EnvState) -> jax.Array:
    total = st.belt_counts.sum()
    props = jax.vmap(
        lambda a: SF.sf_to_f32(SF.sf_div_int(a, jnp.maximum(total, 1).astype(U64))))(
        st.belt_counts.astype(U64))
    props = jnp.where(total > 0, props, jnp.float32(0))
    diffs = _f32_cents(container_purity_cents(cfg, st) - I32(90))
    occ = _f32_cents(st.belt_occupancy.astype(I32))
    if cfg.effective_noise == 0.0:
        # accuracies are exactly {0.75, 1.0}: the f64 view is authoritative
        acc_f32 = st.acc_belt.astype(F32)
    else:
        # exact f64 -> f32 cast from the IEEE-bit view (TPU-safe)
        acc_f32 = jax.vmap(lambda b: SF.sf_to_f32(SF.sf_from_bits(b)))(
            st.acc_belt_bits)
    obs = jnp.concatenate([occ[None], props, acc_f32, diffs])
    return jnp.clip(obs, -1.0, 1.0)


def get_press_obs_exact(cfg: SimConfig, st: EnvState) -> jax.Array:
    levels = jnp.concatenate(
        [st.cont_true[:4] + st.cont_false, st.cont_true[4:5]])
    lv = _T700[levels.clip(0, 24000)]
    sorter = _T100[st.sort_counts.clip(0, 500)]
    t1 = _T12[st.press_timer[0].clip(0, 12)]
    t2 = _T15[st.press_timer[1].clip(0, 15)]
    obs = jnp.concatenate([lv, lv, sorter, jnp.stack([t1, t2])])
    return jnp.clip(obs, 0.0, 1.0)


def get_mono_obs_exact(cfg: SimConfig, st: EnvState) -> jax.Array:
    return jnp.concatenate(
        [get_sort_obs_exact(cfg, st), get_press_obs_exact(cfg, st)])


def use_press_exact(cfg: SimConfig, st: EnvState, press, m) -> Tuple[jax.Array, EnvState]:
    """use_press with quality stored as cents."""
    p = press - 1
    busy = st.press_timer[p] > 0
    total = D._container_level(st, m)
    true_m = jnp.where(m < 4, st.cont_true[m], total)
    q_cents = jnp.where(
        (m < 4) & (total > 0),
        SF.sf_cents(SF.sf_div_int(
            true_m.astype(U64), jnp.maximum(total, 1).astype(U64))).astype(I32),
        I32(0),
    )
    press_time = jnp.where(press == 1, cfg.press_time_1,
                           cfg.press_time_2).astype(I32)
    started = st._replace(
        last_press_started=jnp.ones_like(st.last_press_started),
        last_press_amount=total.astype(I32),
        cont_true=st.cont_true.at[m].set(0),
        cont_false=jnp.where(
            (m < 4) & (jnp.arange(4) == jnp.minimum(m, 3)), 0, st.cont_false),
        press_timer=st.press_timer.at[p].set(press_time),
        press_mat=st.press_mat.at[p].set(m),
        press_n=st.press_n.at[p].set(total.astype(I32)),
        press_q=st.press_q.at[p].set(q_cents.astype(jnp.float64)),
    )
    blocked = st._replace(press_penalty_flag=jnp.ones_like(st.press_penalty_flag))
    st = jax.tree.map(lambda a, b: jnp.where(busy, a, b), blocked, started)
    code = jnp.where(busy, jnp.where(press == 1, 111, 222),
                     (press - 1) * 5 + m + 1)
    return code.astype(I32), st


def bale_quality_int_exact(q_cents) -> jax.Array:
    """``int(q * 100)`` where q is the f64 of cents/100: trunc of the
    f64-rounded product — both roundings replicated in integers."""
    c = q_cents.astype(I32)
    x = SF.sf_div_int(c.astype(U64), U64(100))
    # product f64-round then trunc
    p = x.m * U64(100)
    bl = SF._bitlen(p)
    shift = (bl - 53).clip(0).astype(U64)
    pm = p >> shift
    rem = p - (pm << shift)
    pm = SF._round_half_even(pm, rem, U64(1) << shift)
    ovf = pm == SF.MHIGH
    pm = jnp.where(ovf, pm >> U64(1), pm)
    shift = shift + ovf.astype(U64)
    e = x.e + shift.astype(I32)
    neg = e < 0
    s2 = jnp.where(neg, -e, 0).astype(U64).clip(0, 63)
    q_out = jnp.where(neg, pm >> s2, pm << e.clip(0).astype(U64))
    return jnp.where(x.m == U64(0), I32(0), q_out.astype(I32))


def _press_bale_exact(cfg: SimConfig, st: EnvState, m, n, q_cents) -> EnvState:
    """press_bale with the exact trunc quality."""
    q_int = bale_quality_int_exact(q_cents)
    bs = cfg.effective_balesize
    full = n // bs
    rem = n % bs
    rows = jnp.arange(5, dtype=I32)[:, None]
    lanes = jnp.arange(cfg.max_bales, dtype=I32)[None, :]
    sel = rows == m
    cnt_m = st.bale_cnt[m]
    new_mask = sel & (lanes >= cnt_m) & (lanes < cnt_m + full)
    bale_size = jnp.where(new_mask, bs, st.bale_size)
    bale_qual = jnp.where(new_mask, q_int, st.bale_qual)
    cnt2 = cnt_m + full
    big_rem = rem.astype(jnp.float64) > jnp.float64(
        bs * cfg.bale_remainder_threshold)
    has_rem = rem > 0
    own = has_rem & (big_rem | (cnt2 == 0))
    app = sel & own & (lanes == cnt2)
    bale_size = jnp.where(app, rem, bale_size)
    bale_qual = jnp.where(app, q_int, bale_qual)
    merge = has_rem & ~big_rem & (cnt2 > 0)
    mm = sel & merge & (lanes == cnt2 - 1)
    bale_size = jnp.where(mm, bale_size + rem, bale_size)
    cnt3 = (cnt2 + jnp.where(own, I32(1), I32(0))).astype(I32)
    bale_cnt = jnp.where((jnp.arange(5) == m), cnt3, st.bale_cnt)
    return st._replace(bale_size=bale_size, bale_qual=bale_qual,
                       bale_cnt=bale_cnt)


def check_press_status_exact(cfg: SimConfig, st: EnvState) -> EnvState:
    for p in range(2):
        busy = st.press_timer[p] > 0
        timer = jnp.where(busy, st.press_timer[p] - 1, st.press_timer[p])
        done = busy & (timer == 0)
        baled = _press_bale_exact(cfg, st, st.press_mat[p], st.press_n[p],
                                  st.press_q[p])
        st = jax.tree.map(lambda a, b: jnp.where(done, b, a), st, baled)
        st = st._replace(
            press_timer=st.press_timer.at[p].set(timer),
            press_mat=st.press_mat.at[p].set(jnp.where(done, 0, st.press_mat[p])),
            press_n=st.press_n.at[p].set(jnp.where(done, 0, st.press_n[p])),
            press_q=st.press_q.at[p].set(jnp.where(done, 0.0, st.press_q[p])),
        )
    return st


def press_action_rules_exact(cfg: SimConfig, st: EnvState, press_id, m):
    st = check_press_status_exact(cfg, st)
    code, used = use_press_exact(cfg, st, jnp.maximum(press_id, 1), m)
    noop = press_id == 0
    st = jax.tree.map(lambda a, b: jnp.where(noop, a, b), st, used)
    return jnp.where(noop, 0, code).astype(I32), st


# ---------------------------------------------------------------------------
# Step (rule-based monolith — the benchmark's closed loop) and helpers
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Exact rewards: no f64 arithmetic on device.  The sorting reward comes
# from the finite-domain lookup (reward_tables.py — NumPy's own tanh
# outputs); the press reward decomposes into integer cutoffs, one
# soft-float integer division, a host-enumerated action table, and one
# correctly-rounded signed add (softfloat.sfs_add).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _sort_tab_exact(cfg: SimConfig):
    # NOTE: must return HOST (numpy) constants only — jnp arrays created
    # here would be cached as leaked tracers when first called under jit
    from . import reward_tables as RT

    t = RT.build_sorting_table(cfg)
    return (t.idx2, t.idx3, t.idx4, t.reward_sign, t.reward_m, t.reward_e)


@functools.lru_cache(maxsize=4)
def _press_tab_exact(cfg: SimConfig):
    # host constants only (see _sort_tab_exact)
    from . import reward_tables as RT

    # the exact engine supports the reference's 0.5 exactly (an exponent
    # decrement); any other value would need a general sf multiply
    assert cfg.max_state_reward == 0.5, "exact press reward needs msr=0.5"
    # the exact path keys the penalty early-return / flag-keep on overflow
    # *presence* and prefers the severe constant — equivalent to the
    # reference's max_penalty<0 + min() accumulation only when the
    # penalties are ordered and negative (env_super.py:1011-1030)
    assert (cfg.overflow_penalty_catastrophic
            <= cfg.overflow_penalty_severe
            <= cfg.overflow_penalty_mild < 0), (
        "exact press reward requires catastrophic <= severe <= mild < 0")
    t = RT.build_press_table(cfg)

    def const(v):
        s, m, e = RT._decompose(np.asarray([v], np.float64))
        return (np.int32(s[0]), np.uint64(m[0]), np.int32(e[0]))

    return (t.cut_catastrophic, t.cut_severe, t.cut_mild,
            t.action_sign, t.action_m, t.action_e,
            const(cfg.overflow_penalty_catastrophic),
            const(cfg.overflow_penalty_severe),
            const(cfg.overflow_penalty_mild))


def _sfs_where(c, a: SF.SFS, b: SF.SFS) -> SF.SFS:
    return SF.SFS(jnp.where(c, a.s, b.s), jnp.where(c, a.m, b.m),
                  jnp.where(c, a.e, b.e))


def calculate_sorting_reward_exact(cfg: SimConfig, st: EnvState) -> SF.SFS:
    """Bit-exact sorting reward from purity cents (env_super.py:963-1003
    via the finite-domain table)."""
    idx2, idx3, idx4, s, m, e = map(jnp.asarray, _sort_tab_exact(cfg))
    c = container_purity_cents(cfg, st)
    k = idx4[idx3[idx2[c[0], c[1]], c[2]], c[3]]
    return SF.SFS(s[k], m[k], e[k])


def calculate_press_reward_exact(
        cfg: SimConfig, st: EnvState) -> Tuple[SF.SFS, EnvState]:
    """Bit-exact press reward (env_super.py:1006-1080) in integers +
    soft-float.  Mirrors dynamics.calculate_press_reward including the
    flag-reset semantics."""
    (cut_cat, cut_sev, cut_mild, asign, am, ae,
     c_cat, c_sev, c_mild) = _press_tab_exact(cfg)
    asign, am, ae = jnp.asarray(asign), jnp.asarray(am), jnp.asarray(ae)

    levels = jnp.concatenate(
        [st.cont_true[:4] + st.cont_false, st.cont_true[4:5]])
    catastrophic = jnp.any(levels >= cut_cat)
    severe = jnp.any(levels >= cut_sev)
    mild = jnp.any(levels >= cut_mild)

    total = levels.sum()
    overall = SF.sf_div_int(total.astype(U64),
                            U64(5 * cfg.container_capacity))
    # * max_state_reward (0.5): exact exponent decrement
    state = SF.SFJ(overall.m, overall.e - I32(1))

    bs = cfg.effective_balesize
    amount = st.last_press_amount
    rem = amount % bs
    dist = jnp.minimum(rem, bs - rem)
    nb = jnp.minimum(amount // bs, 3)
    action = SF.SFS(asign[dist, nb], am[dist, nb], ae[dist, nb])
    zero = SF.SFS(I32(0), U64(0), I32(0))
    action = _sfs_where(st.last_press_started > 0, action, zero)

    normal = SF.sfs_clip1(SF.sfs_add(SF.sfs_of(state), action))
    penalized = _sfs_where(severe, SF.SFS(*c_sev), SF.SFS(*c_mild))
    reward = _sfs_where(
        catastrophic, SF.SFS(*c_cat),
        _sfs_where(severe | mild, penalized, normal))

    keep = catastrophic | severe | mild
    st = st._replace(
        last_press_started=jnp.where(keep, st.last_press_started,
                                     jnp.zeros_like(st.last_press_started)),
        last_press_amount=jnp.where(keep, st.last_press_amount, 0),
    )
    return reward, st


@partial(jax.jit, static_argnums=(0,))
def step_mono_rule_exact(cfg: SimConfig, st: EnvState):
    """Exact-mode equivalent of core.step.step_mono_rule, including
    bit-exact rewards (emitted as IEEE-754 bit patterns)."""
    st = D.input_action_rules(cfg, st)
    st = update_environment_exact(cfg, st)
    sort_mode = D.sorting_rules(st)
    press_id, mat = D.check_container_level(cfg, st)

    st = st._replace(sensor_setting=jnp.asarray(sort_mode, I32))
    st = update_accuracy_exact(cfg, st)
    purity_cents, st = sort_material_exact(cfg, st)
    log, st = press_action_rules_exact(cfg, st, press_id, mat)

    sort_reward = calculate_sorting_reward_exact(cfg, st)
    press_reward, st = calculate_press_reward_exact(cfg, st)
    reward = SF.sfs_add(sort_reward, press_reward)

    obs = get_mono_obs_exact(cfg, st)
    st = st._replace(current_step=st.current_step + 1)
    terminated = st.current_step >= cfg.max_steps
    flat = sort_mode * 11 + jnp.where(press_id == 0, 0,
                                      (press_id - 1) * 5 + mat + 1)
    return st, {
        "obs": obs,
        "terminated": terminated,
        "action": flat.astype(I32),
        "purity_cents": purity_cents,
        "press_log": log,
        "reward_bits": SF.sfs_to_bits(reward),
        "sort_reward_bits": SF.sfs_to_bits(sort_reward),
        "press_reward_bits": SF.sfs_to_bits(press_reward),
        "reward_sfs": reward,
    }


# ---------------------------------------------------------------------------
# Exact variants of the step paths.  Every action source that involves
# no float MLP forward is TPU-exact directly: external actions
# (training/eval replay), the random-masked press side of Env_1
# (rng_pressing, pure integers), rule-based sides, and sanitize paths.
# Model-in-the-loop paths are TPU-exact through the INTEGER policy
# forward (models.mlp_exact — Q12 fixed point, i64 accumulation,
# integer tanh table): see step_press_model_exact / step_mono_model_exact
# below.  The f32 ``models.mlp`` forward itself remains outside the
# bit-exact surface (f32 matmul+tanh is not bit-portable CPU<->MXU);
# the quantized policy is the authoritative policy of the exact engine.
# ---------------------------------------------------------------------------

def _exact_prelude(cfg: SimConfig, st: EnvState) -> EnvState:
    st = D.input_action_rules(cfg, st)
    return update_environment_exact(cfg, st)


def _exact_apply_sort(cfg: SimConfig, st: EnvState, sort_mode):
    st = st._replace(sensor_setting=jnp.asarray(sort_mode, I32))
    st = update_accuracy_exact(cfg, st)
    return sort_material_exact(cfg, st)


@partial(jax.jit, static_argnums=(0,))
def step_sort_exact(cfg: SimConfig, st: EnvState, action):
    """Exact Env_1_Sorting step (core.step.step_sort): agent sort mode,
    random *masked* press action via rng_pressing, sorting reward only."""
    st = _exact_prelude(cfg, st)
    purity_cents, st = _exact_apply_sort(cfg, st, action)
    press_id, mat, st = D.sample_masked_press_action(cfg, st)
    log, st = press_action_rules_exact(cfg, st, press_id, mat)
    reward = calculate_sorting_reward_exact(cfg, st)
    obs = get_sort_obs_exact(cfg, st)
    st = st._replace(current_step=st.current_step + 1)
    return st, {
        "obs": obs,
        "terminated": st.current_step >= cfg.max_steps,
        "action": jnp.asarray(action, I32),
        "purity_cents": purity_cents,
        "press_log": log,
        "reward_bits": SF.sfs_to_bits(reward),
        "reward_sfs": reward,
    }


@partial(jax.jit, static_argnums=(0, 3))
def step_press_exact(cfg: SimConfig, st: EnvState, action,
                     use_action_masking: bool = True):
    """Exact Env_2_Pressing step with the rule-based sort side
    (core.step.step_press without a frozen agent): agent press action
    (sanitized when masking is off), press reward only."""
    st = _exact_prelude(cfg, st)
    sort_mode = D.sorting_rules(st)
    purity_cents, st = _exact_apply_sort(cfg, st, sort_mode)

    a = jnp.asarray(action, I32)
    if use_action_masking:
        press_id, mat = D.press_discrete_to_action(a)
        invalid_code = jnp.zeros((), I32)
    else:
        press_id, mat, _, invalid_code = D.sanitize_press_action(cfg, st, a)
    log, st = press_action_rules_exact(cfg, st, press_id, mat)
    log = jnp.where(invalid_code != 0, invalid_code, log)

    reward, st = calculate_press_reward_exact(cfg, st)
    obs = get_press_obs_exact(cfg, st)
    st = st._replace(current_step=st.current_step + 1)
    return st, {
        "obs": obs,
        "terminated": st.current_step >= cfg.max_steps,
        "action": a,
        "purity_cents": purity_cents,
        "press_log": log,
        "reward_bits": SF.sfs_to_bits(reward),
        "reward_sfs": reward,
    }


@partial(jax.jit, static_argnums=(0, 3))
def step_mono_external_exact(cfg: SimConfig, st: EnvState, action,
                             use_action_masking: bool = True):
    """Exact external-action monolith step (core.step.step_mono_external),
    including the sanitize quirk: an invalid unmasked action skips
    press_action_rules entirely, so press timers do not tick."""
    st = _exact_prelude(cfg, st)
    a = jnp.asarray(action, I32)
    sort_mode = a // 11
    press_disc = a % 11
    if use_action_masking:
        press_id, mat = D.press_discrete_to_action(press_disc)
        skip = jnp.zeros((), bool)
        inv_code = jnp.zeros((), I32)
    else:
        press_id, mat, skip, inv_code = D.sanitize_press_action(
            cfg, st, press_disc)

    purity_cents, st = _exact_apply_sort(cfg, st, sort_mode)
    log_exec, dispatched = press_action_rules_exact(cfg, st, press_id, mat)
    st = jax.tree.map(lambda x, y: jnp.where(skip, x, y), st, dispatched)
    log = jnp.where(skip, inv_code, log_exec)

    sort_reward = calculate_sorting_reward_exact(cfg, st)
    press_reward, st = calculate_press_reward_exact(cfg, st)
    reward = SF.sfs_add(sort_reward, press_reward)
    obs = get_mono_obs_exact(cfg, st)
    st = st._replace(current_step=st.current_step + 1)
    return st, {
        "obs": obs,
        "terminated": st.current_step >= cfg.max_steps,
        "action": a,
        "purity_cents": purity_cents,
        "press_log": log,
        "reward_bits": SF.sfs_to_bits(reward),
        "sort_reward_bits": SF.sfs_to_bits(sort_reward),
        "press_reward_bits": SF.sfs_to_bits(press_reward),
        "reward_sfs": reward,
    }


@partial(jax.jit, static_argnums=(0, 3))
def step_mono_random_exact(cfg: SimConfig, st: EnvState, lr,
                           use_action_masking: bool = True):
    """Exact monolith ``mode='random'`` step (core.step.step_mono_legacy_random,
    env_monolith.py:152-164): the legacy global MT19937 draws are pure
    integers, the masks are pure integer state predicates, so the whole
    path is TPU-exact.  ``lr`` is a ``legacy_random.MTState``."""
    from . import legacy_random as LR

    st = _exact_prelude(cfg, st)
    if use_action_masking:
        mask = D.monolith_action_masks(cfg, st)
        n_valid = mask.sum().astype(I32)
        k, lr = LR.legacy_randint(lr, n_valid)
        csum = jnp.cumsum(mask.astype(I32))
        a = jnp.argmax(csum == (k + 1)).astype(I32)
        press_id, mat = D.press_discrete_to_action(a % 11)
        skip = jnp.zeros((), bool)
        inv_code = jnp.zeros((), I32)
    else:
        a, lr = LR.legacy_randint(lr, 22)
        # mode='random' without masking sanitizes and *skips* the press
        # dispatch entirely on invalid (env_monolith.py:246-255)
        press_id, mat, skip, inv_code = D.sanitize_press_action(
            cfg, st, a % 11)
    sort_mode = a // 11

    purity_cents, st = _exact_apply_sort(cfg, st, sort_mode)
    log_exec, dispatched = press_action_rules_exact(cfg, st, press_id, mat)
    st = jax.tree.map(lambda x, y: jnp.where(skip, x, y), st, dispatched)
    log = jnp.where(skip, inv_code, log_exec)

    sort_reward = calculate_sorting_reward_exact(cfg, st)
    press_reward, st = calculate_press_reward_exact(cfg, st)
    reward = SF.sfs_add(sort_reward, press_reward)
    obs = get_mono_obs_exact(cfg, st)
    st = st._replace(current_step=st.current_step + 1)
    return st, lr, {
        "obs": obs,
        "terminated": st.current_step >= cfg.max_steps,
        "action": a,
        "purity_cents": purity_cents,
        "press_log": log,
        "reward_bits": SF.sfs_to_bits(reward),
        "sort_reward_bits": SF.sfs_to_bits(sort_reward),
        "press_reward_bits": SF.sfs_to_bits(press_reward),
        "reward_sfs": reward,
    }


@partial(jax.jit, static_argnums=(0, 4))
def step_press_model_exact(cfg: SimConfig, st: EnvState, action, q_sort,
                           use_action_masking: bool = True):
    """Exact Env_2_Pressing step with the FROZEN SORTING AGENT evaluated
    in pure integer arithmetic (models.mlp_exact) — the hierarchical
    boundary of env_2_press.py:106-109, now inside the TPU-bit-exact
    surface.  ``q_sort`` is a ``mlp_exact.QPolicy``; the sort obs it
    sees is the exact engine's bit-authoritative f32 observation, so
    the Q12 quantization and the integer forward are backend-invariant
    end to end."""
    from ..models import mlp_exact as MX

    st = _exact_prelude(cfg, st)
    sort_obs = get_sort_obs_exact(cfg, st)
    sort_mode = MX.predict_deterministic_q(q_sort, sort_obs)
    purity_cents, st = _exact_apply_sort(cfg, st, sort_mode)

    a = jnp.asarray(action, I32)
    if use_action_masking:
        press_id, mat = D.press_discrete_to_action(a)
        invalid_code = jnp.zeros((), I32)
    else:
        press_id, mat, _, invalid_code = D.sanitize_press_action(cfg, st, a)
    log, st = press_action_rules_exact(cfg, st, press_id, mat)
    log = jnp.where(invalid_code != 0, invalid_code, log)

    reward, st = calculate_press_reward_exact(cfg, st)
    obs = get_press_obs_exact(cfg, st)
    st = st._replace(current_step=st.current_step + 1)
    return st, {
        "obs": obs,
        "terminated": st.current_step >= cfg.max_steps,
        "action": a,
        "sort_mode": sort_mode,
        "purity_cents": purity_cents,
        "press_log": log,
        "reward_bits": SF.sfs_to_bits(reward),
        "reward_sfs": reward,
    }


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _step_mono_model_exact_impl(cfg, st, q_sort, q_press,
                                has_sort, has_press, use_action_masking):
    from ..models import mlp_exact as MX

    st = _exact_prelude(cfg, st)

    if has_sort:
        sort_mode = MX.predict_deterministic_q(
            q_sort, get_sort_obs_exact(cfg, st))
    else:
        # fallback: rng_sorting.choice([0, 1]) (env_monolith.py:195)
        idx, rs = R.choice_n(st.rng_sorting, 2)
        sort_mode = idx.astype(I32)
        st = st._replace(rng_sorting=rs)

    if has_press:
        press_obs = get_press_obs_exact(cfg, st)
        if use_action_masking:
            mask = D.press_action_masks(cfg, st)
            press_disc = MX.predict_deterministic_q(q_press, press_obs, mask)
        else:
            press_disc = MX.predict_deterministic_q(q_press, press_obs)
    else:
        if use_action_masking:
            # rng_pressing.choice(valid) (env_monolith.py:215-217)
            mask = D.press_action_masks(cfg, st)
            n_valid = mask.sum().astype(I32)
            k, rp = R._lemire32(st.rng_pressing,
                                (n_valid - 1).astype(jnp.uint32))
            csum = jnp.cumsum(mask.astype(I32))
            press_disc = jnp.argmax(csum == (k.astype(I32) + 1)).astype(I32)
        else:
            k, rp = R.choice_n(st.rng_pressing, 11)
            press_disc = k.astype(I32)
        st = st._replace(rng_pressing=rp)

    press_id, mat = D.press_discrete_to_action(press_disc)
    a = sort_mode * 11 + press_disc

    purity_cents, st = _exact_apply_sort(cfg, st, sort_mode)
    log, st = press_action_rules_exact(cfg, st, press_id, mat)

    sort_reward = calculate_sorting_reward_exact(cfg, st)
    press_reward, st = calculate_press_reward_exact(cfg, st)
    reward = SF.sfs_add(sort_reward, press_reward)
    obs = get_mono_obs_exact(cfg, st)
    st = st._replace(current_step=st.current_step + 1)
    return st, {
        "obs": obs,
        "terminated": st.current_step >= cfg.max_steps,
        "action": a,
        "purity_cents": purity_cents,
        "press_log": log,
        "reward_bits": SF.sfs_to_bits(reward),
        "sort_reward_bits": SF.sfs_to_bits(sort_reward),
        "press_reward_bits": SF.sfs_to_bits(press_reward),
        "reward_sfs": reward,
    }


def step_mono_model_exact(cfg: SimConfig, st: EnvState, q_sort=None,
                          q_press=None, use_action_masking: bool = True):
    """Exact monolith 'model' path (env_monolith.py:186-221 /
    core.step.step_mono_model with press_is_maskable=True): modular
    integer-policy agents with the reference's random fallbacks
    (rng_sorting / rng_pressing, both pure-integer PCG64 draws).  The
    PPO Sort-Only and PPO Modular benchmark scenarios run through this
    step — bit-exact on TPU including the agents' actions."""
    return _step_mono_model_exact_impl(
        cfg, st, q_sort, q_press,
        q_sort is not None, q_press is not None, use_action_masking)


@partial(jax.jit, static_argnums=(0, 3))
def step_mono_policy_exact(cfg: SimConfig, st: EnvState, q_mono,
                           use_action_masking: bool = True):
    """Exact monolith-agent benchmark step (core.step.step_mono_policy /
    testing.py:37-44): the integer policy predicts deterministically on
    the PRE-step observation (masked iff masking is on) and the flat
    action goes through the external path — including the sanitize
    timer-freeze quirk when unmasked.  With this, every scenario of the
    reference's 5-policy benchmark is TPU-bit-exact."""
    from ..models import mlp_exact as MX

    obs = get_mono_obs_exact(cfg, st)          # pre-step = last step's obs
    if use_action_masking:
        mask = D.monolith_action_masks(cfg, st)
        flat = MX.predict_deterministic_q(q_mono, obs, mask)
    else:
        flat = MX.predict_deterministic_q(q_mono, obs)
    return step_mono_external_exact(cfg, st, flat, use_action_masking)


@partial(jax.jit, static_argnums=(0, 2))
def rollout_rule_exact(cfg: SimConfig, st: EnvState, steps: int):
    """Full rule-based episode with the cumulative return accumulated
    on-device in signed soft-float — the reference's headline benchmark
    metric (testing.py:78-85: Python-float left-to-right sum), bit-exact
    whatever the accelerator's f64 does."""
    def body(carry, _):
        st, acc = carry
        st, out = step_mono_rule_exact(cfg, st)
        acc = SF.sfs_add(acc, out["reward_sfs"])
        out = {k: v for k, v in out.items() if k != "reward_sfs"}
        return (st, acc), out

    (st, acc), outs = lax.scan(
        body, (st, SF.sfs_zero()), None, length=steps)
    return st, outs, SF.sfs_to_bits(acc)


def to_parity_view(st: EnvState) -> dict:
    """Convert exact-mode state fields (cents) to parity-engine units for
    comparisons (host-side)."""
    return {
        "cont_true": np.asarray(st.cont_true),
        "cont_false": np.asarray(st.cont_false),
        "press_timer": np.asarray(st.press_timer),
        "press_n": np.asarray(st.press_n),
        "press_q_cents": np.asarray(st.press_q),
        "input_occupancy_cents": np.asarray(st.input_occupancy),
        "bale_size": np.asarray(st.bale_size),
        "bale_qual": np.asarray(st.bale_qual),
        "bale_cnt": np.asarray(st.bale_cnt),
        "current_step": np.asarray(st.current_step),
        # exact f64 accuracies (decode with np.uint64.view(np.float64))
        "acc_belt_bits": np.asarray(st.acc_belt_bits),
        "acc_sorter_bits": np.asarray(st.acc_sorter_bits),
    }
