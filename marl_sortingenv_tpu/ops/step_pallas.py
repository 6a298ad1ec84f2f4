"""Fused Pallas TPU kernel for the WHOLE monolith env step.

Round 3 fused the sorting redistribution (``ops/sort_pallas.py``); the
round-4 device profile shows the remaining step is ~17 us of ~27 small
fusions per step at 4096 envs (threefry splits for the input generator
and accuracy noise, press/bale-event updates, rewards, observations) —
pure op-issue latency on state that fits comfortably in VMEM.  This
kernel runs the ENTIRE ``fastb.step_mono_rule`` / ``step_mono_external``
body (reference behavior: ``env_monolith.py:109-284`` and the
``env_super.py`` plant dynamics it composes) in one ``pallas_call``.

Bitwise contract: identical trajectories to the XLA ``core.fastb`` path
(asserted in interpret mode in ``tests/test_step_pallas.py`` and on the
real chip in ``bench.py``).  The kernel mirrors the XLA path op for op:

* RNG: the exact ``fastb`` key chain —
  ``split(key)`` for the input generator, whose ``randint(k, (4,), 0, 4)``
  is ``split(k)[1]`` -> ``random_bits % 4`` (jax's 2*nbits modular
  scheme degenerates to ``lower_bits % span`` because the multiplier
  ``(2**16 % 4)**2 % 4`` is 0); ``split`` for accuracy noise whose
  ``uniform(k, (4,), -n, n)`` is ``max(-n, u01*(2n) - n)``; then the
  sort section's 4x(split2, split3, 3 uniforms) chain from
  ``sort_pallas``.  Partitionable threefry semantics throughout
  (element i of a shape-(4,) draw = block (0, i), word o0^o1 — verified
  against jax.random bitwise).
* sampler: ``sort_pallas._hg_u`` op-for-op.
* everything else: elementwise/row ops with the same association as the
  fastb source lines cited inline.  ``tanh`` is NOT computed in-kernel
  (Mosaic's lowering need not match XLA's bit for bit): the kernel
  returns the pre-tanh sorting-reward argument and the caller applies
  ``jnp.tanh`` exactly as ``fastb._sorting_reward`` does.

Scope (static config): event-log bale mode only (the production
configuration; ``bale_mode='full'`` keeps the XLA path).  Variants:
monolith ``rule`` and ``external`` (masked or sanitize-unmasked), and —
since round 5 — ``sort`` (Env_1, ``fastb.step_sort`` with the in-kernel
masked random press) and ``press`` (Env_2, ``fastb.step_press`` without
a frozen sort policy; reference ``env_1_sort.py:97-154`` /
``env_2_press.py:88-165``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sort_pallas import (_bits_to_unit_f32, _hg_u, _threefry,
                          pjit_auto_sharded)

U32 = jnp.uint32
I32 = jnp.int32
I16 = jnp.int16
F32 = jnp.float32

_STEP_TILE = 32  # sublane rows (= 4096 envs) per grid program: the step
# kernel's live set (state + E event rows + the sampler's (support,
# tile, 128) pmf buffers) stays under the VMEM budget at 32 for the
# default event-log depth.

# VMEM guard for the event log (ADVICE r4): the 3 i16 event arrays are
# 3*E*tile*128*2 B PER SIDE, and exist as both input and output blocks
# (plus Pallas pipeline buffering), so the event working set scales as
# E*tile.  Rather than trust a theoretical double-buffering model, the
# cap is anchored to an ON-CHIP-VALIDATED product: E=94 (max_steps=600)
# at tile=32 Mosaic-compiles and runs bitwise vs XLA, and deeper logs
# shrink the tile proportionally (E=213/max_steps=1400 at tile=8
# likewise validated) — artifacts/bigE_validation.log.
_EV_TILE_PRODUCT = 94 * 32


def _tile_for(bs: int, E: int = 0) -> int:
    cap = _STEP_TILE
    if E > 0:
        cap = min(cap, max(1, _EV_TILE_PRODUCT // E))
    for t in range(min(bs, cap), 0, -1):
        if bs % t == 0:
            return t
    return 1


def _split2(k0, k1):
    """(new_key, sub_key) pairs — jax.random.split(key, 2) bitwise."""
    shape = (2,) + k0.shape
    o0, o1 = _threefry(k0[None], k1[None], jnp.zeros(shape, U32),
                       lax.broadcasted_iota(U32, shape, 0))
    return (o0[0], o1[0]), (o0[1], o1[1])


def _bits4(k0, k1):
    """random_bits(key, 32, (4,)) bitwise: element i = block (0, i)."""
    shape = (4,) + k0.shape
    o0, o1 = _threefry(k0[None], k1[None], jnp.zeros(shape, U32),
                       lax.broadcasted_iota(U32, shape, 0))
    return o0 ^ o1


def _uniform4(k0, k1, lo, hi):
    """jax.random.uniform(key, (4,), f32, lo, hi) bitwise: the span is
    computed as an f32 runtime subtraction exactly as jax's _uniform
    does (``floats * (maxval - minval) + minval`` under a final max)."""
    u01 = _bits_to_unit_f32(_bits4(k0, k1))
    return jnp.maximum(F32(lo), u01 * (F32(hi) - F32(lo)) + F32(lo))


def _row_at(rows, m):
    """rows: list of (BS,L) arrays; m: i32 index array -> rows[m]."""
    out = jnp.zeros_like(rows[0])
    for r, row in enumerate(rows):
        out = jnp.where(m == r, row, out)
    return out


def _kernel(cfg_c, refs, *, variant, masked, support, autoreset):
    """cfg_c: dict of host constants; refs: flat list (inputs then
    outputs) in the order built by step_mono."""
    i = iter(refs)

    def nxt(rows):
        r = next(i)
        return [r[j] for j in range(rows)]

    # ---- inputs (events bale mode) ----------------------------------
    input_c = nxt(4)
    belt_c = nxt(4)
    acc_belt = nxt(4)
    (input_occ,) = nxt(1)
    cont_t = nxt(5)
    cont_f = nxt(4)
    timer = nxt(2)
    pmat = nxt(2)
    pn = nxt(2)
    pq = nxt(2)
    E = cfg_c["E"]
    # event buffers as whole (E, BS, L) blocks — vectorized over the
    # event axis like the XLA path (and ~200 fewer unrolled Mosaic ops)
    ev_mat = next(i)[...]
    ev_n = next(i)[...]
    ev_q = next(i)[...]
    (ev_cnt,) = nxt(1)
    (lps,) = nxt(1)      # last_press_started as i32 0/1
    (lpa,) = nxt(1)
    (gfirst,) = nxt(1)
    (gidx,) = nxt(1)
    (gctr,) = nxt(1)
    (cstep,) = nxt(1)
    (totin,) = nxt(1)
    key = nxt(2)
    action = nxt(1)[0] if variant != "rule" else None

    # ---- 1. update_environment (fastb._update_environment) ----------
    sort_c = belt_c                      # sorting <- belt
    belt_c = input_c                     # belt <- input
    belt_occ = input_occ
    # generate_input (fastb._generate_input)
    switch = gctr >= I32(cfg_c["steps_per_pattern"])
    gidx = jnp.where(switch, (gidx + 1) % 2, gidx)
    gctr = jnp.where(switch, 0, gctr) + 1
    row = (gfirst + gidx) % 2
    units = [jnp.where(row == 0, I32(cfg_c["units0"][j]),
                       I32(cfg_c["units1"][j])) for j in range(4)]
    rem = jnp.where(row == 0, I32(cfg_c["rem0"]), I32(cfg_c["rem1"]))
    key_t, k1 = _split2(key[0], key[1])
    # randint(k1, (4,), 0, 4) == random_bits(split(k1)[1]) % 4
    _, k1b = _split2(k1[0], k1[1])
    ms = _bits4(k1b[0], k1b[1]) & U32(3)          # (4, BS, L)
    for j in range(4):
        active = I32(j) < rem
        for c in range(4):
            units[c] = units[c] + jnp.where(
                active & (ms[j] == U32(c)), I32(1), I32(0))
    input_c = units
    in_sum = units[0] + units[1] + units[2] + units[3]
    input_occ = in_sum.astype(F32) / F32(100.0)
    totin = totin + in_sum
    acc_sorter = acc_belt                # one-step delay

    # ---- 2. action select -------------------------------------------
    # sort_mode source: the flat action (external), the action itself
    # (sort env, fastb.step_sort), or _sorting_rules on the NEW belt
    # (rule mono + press env, fastb.step_press without a sort policy)
    if variant == "external":
        sort_mode = action // I32(11)
        press_disc = action % I32(11)
    elif variant == "sort":
        sort_mode = action
    elif variant == "press":
        sort_mode = jnp.where(belt_c[0] + belt_c[2] > belt_c[1] + belt_c[3],
                              I32(0), I32(1))
        press_disc = action
    else:
        # fastb._sorting_rules on the NEW belt
        sort_mode = jnp.where(belt_c[0] + belt_c[2] > belt_c[1] + belt_c[3],
                              I32(0), I32(1))
        # fastb._check_container_level on PRE-sort containers
        free1 = timer[0] == 0
        free2 = timer[1] == 0
        free_press = jnp.where(free1, I32(1), jnp.where(free2, I32(2),
                                                        I32(0)))
        levels_ad = [cont_t[j] + cont_f[j] for j in range(4)]
        best_idx = jnp.zeros_like(sort_mode)
        best_lvl = levels_ad[0]
        for j in (1, 2, 3):              # first-max-wins == jnp.argmax
            take = levels_ad[j] > best_lvl
            best_idx = jnp.where(take, I32(j), best_idx)
            best_lvl = jnp.where(take, levels_ad[j], best_lvl)
        lvl_e = cont_t[4]
        best_idx = jnp.where(lvl_e > best_lvl, I32(4), best_idx)
        best_lvl = jnp.maximum(best_lvl, lvl_e)
        ok = (free_press > 0) & (best_lvl > 0)
        press_id_rule = jnp.where(ok, free_press, I32(0))
        mat_rule = jnp.where(ok, best_idx, I32(0))

    # ---- 3. update_accuracy (fastb._update_accuracy) ----------------
    key_t, s2 = _split2(key_t[0], key_t[1])
    acc = []
    boost = cfg_c["boost"]
    for j in range(4):
        b_ac = boost if j in (0, 2) else 0.0
        b_bd = boost if j in (1, 3) else 0.0
        a = F32(cfg_c["base_acc"][j]) + jnp.where(
            sort_mode == 0, F32(b_ac),
            jnp.where(sort_mode == 1, F32(b_bd), F32(0.0)))
        acc.append(a)
    if cfg_c["noise"] > 0.0:
        noise = _uniform4(s2[0], s2[1], -cfg_c["noise"], cfg_c["noise"])
        acc = [acc[j] + noise[j] for j in range(4)]
    acc_belt = [jnp.clip(a, F32(0.0), F32(1.0)) for a in acc]

    # ---- 4. sort_material — ONE lax.fori_loop over the 4 stations
    # (round 5, VERDICT r4 #5): the unrolled form emitted the station
    # body (3 threefry blocks + 3 support-wide inverse-CDF draws) four
    # times, and that body dominates the kernel's Mosaic compile time.
    # The loop body runs the EXACT per-station op sequence of the
    # unrolled form — the key chain is self-contained (one split per
    # station, independent of sampler results) and the dynamic row
    # picks/writes are pure selects — so the trajectory is bitwise
    # unchanged (asserted by every test in tests/test_step_pallas.py
    # and the on-chip A/Bs in bench.py).
    total_input = sort_c[0] + sort_c[1] + sort_c[2] + sort_c[3]
    k0, k1_ = key_t
    shape2 = (2,) + k0.shape
    shape3 = (3,) + k0.shape
    lo2 = lax.broadcasted_iota(U32, shape2, 0)
    lo3 = lax.broadcasted_iota(U32, shape3, 0)
    z2 = jnp.zeros(shape2, U32)
    z3 = jnp.zeros(shape3, U32)
    lv0 = jnp.stack(sort_c)                     # (4, BS, L) i32
    accs = jnp.stack(acc_sorter)                # (4, BS, L) f32
    rows4 = lax.broadcasted_iota(I32, lv0.shape, 0)

    def station(st_i, carry):
        k0, k1_, lv, tarr, farr = carry
        o0, o1 = _threefry(k0[None], k1_[None], z2, lo2)
        k0n, k1n = o0[0], o1[0]
        s0, s1 = o0[1], o1[1]
        p0, p1 = _threefry(s0[None], s1[None], z3, lo3)
        q0, q1 = _threefry(p0, p1, z3, z3)
        u = _bits_to_unit_f32(q0 ^ q1)          # (3, BS, L)
        sel_i = rows4 == st_i
        # dynamic row pick as a pure select chain (no arithmetic, no
        # x64-promoting reduction) — bit-exact by construction
        target = lv[0]
        acc_i = accs[0]
        for j in (1, 2, 3):
            pick = st_i == j
            target = jnp.where(pick, lv[j], target)
            acc_i = jnp.where(pick, accs[j], acc_i)
        true_val = jnp.rint(target.astype(F32) * acc_i).astype(I32)
        false_val = target - true_val
        tarr = jnp.where(sel_i, true_val[None], tarr)
        farr = jnp.where(sel_i, false_val[None], farr)
        lv = jnp.where(sel_i, false_val[None], lv)
        N_ = lv[0] + lv[1] + lv[2] + lv[3]
        n_ = jnp.minimum(false_val, N_)
        d0 = _hg_u(u[0], N_, lv[0], n_, support)
        N1 = N_ - lv[0]
        n1 = n_ - d0
        d1 = _hg_u(u[1], N1, lv[1], n1, support)
        N2 = N1 - lv[1]
        n2 = n1 - d1
        d2 = _hg_u(u[2], N2, lv[2], n2, support)
        d3 = n2 - d2
        # the draws are < support; the cast is exact (it only undoes the
        # x64 test environment's int64 reduction promotion inside _hg_u)
        lv = lv - jnp.stack([d0, d1, d2, d3]).astype(I32)
        return k0n, k1n, lv, tarr, farr

    k0, k1_, lv, tarr, farr = lax.fori_loop(
        0, 4, station, (k0, k1_, lv0, jnp.zeros_like(lv0),
                        jnp.zeros_like(lv0)))
    key = (k0, k1_)
    leftover = [lv[j] for j in range(4)]
    true_arr = [tarr[j] for j in range(4)]
    false_arr = [farr[j] for j in range(4)]

    e_input = leftover[0] + leftover[1] + leftover[2] + leftover[3]
    cont_t = [cont_t[j] + true_arr[j] for j in range(4)] + \
        [cont_t[4] + e_input]
    cont_f = [cont_f[j] + false_arr[j] for j in range(4)]
    true_sum = true_arr[0] + true_arr[1] + true_arr[2] + true_arr[3]
    purity = jnp.where(
        total_input > 0,
        F32(1.0) - (total_input - true_sum).astype(F32)
        / jnp.maximum(total_input, 1).astype(F32),
        F32(0.0))

    # ---- 5. press action --------------------------------------------
    if variant in ("external", "press"):
        press_id = jnp.where(press_disc == 0, I32(0),
                             jnp.where(press_disc <= 5, I32(1), I32(2)))
        mat = jnp.where(press_disc == 0, I32(0), (press_disc - 1) % 5)
        if not masked:
            # fastb._validate_press (on the POST-sort state, as the
            # unmasked branches compute it)
            busy_v = jnp.where(press_id == 1, timer[0] > 0,
                               jnp.where(press_id == 2, timer[1] > 0,
                                         False))
            lvl_v = _row_at([cont_t[j] + cont_f[j] for j in range(4)]
                            + [cont_t[4]], jnp.minimum(mat, 4))
            okv = (~busy_v) & (lvl_v >= I32(cfg_c["balesize"]))
            valid = jnp.where(press_id == 0, True, okv)
            if variant == "press":
                # fastb.step_press sanitize: invalid -> no-op press
                # (press_id/mat zeroed) but the press PHASE still runs
                # (timers tick) — unlike the mono freeze semantics below
                press_id = jnp.where(valid, press_id, I32(0))
                mat = jnp.where(valid, mat, I32(0))
    elif variant == "sort":
        # fastb._sample_masked_press on the POST-sort containers and
        # PRE-tick timers: split, one f32 uniform, uniform-rank pick
        # over the 11-way mask (masked_uniform_choice — log-free by
        # construction so this kernel matches it bit for bit)
        key, sku = _split2(key[0], key[1])
        b0, b1 = _threefry(sku[0][None], sku[1][None],
                           jnp.zeros((1,) + sku[0].shape, U32),
                           jnp.zeros((1,) + sku[0].shape, U32))
        u = _bits_to_unit_f32(b0[0] ^ b1[0])
        lvl_rows5 = [cont_t[j] + cont_f[j] for j in range(4)] + [cont_t[4]]
        p_free = [timer[0] == 0, timer[1] == 0]
        mrows = [jnp.full_like(p_free[0], True)]
        for p in range(2):
            for j in range(5):
                mrows.append((lvl_rows5[j] >= I32(cfg_c["balesize"]))
                             & p_free[p])
        c = jnp.zeros_like(cstep)
        cum = []
        for m_ in mrows:
            c = c + m_.astype(I32)
            cum.append(c)
        nv = cum[-1]
        r = jnp.minimum((u * nv.astype(F32)).astype(I32), nv - 1)
        a_draw = jnp.zeros_like(cstep)
        for cj in cum:
            a_draw = a_draw + (cj <= r).astype(I32)
        press_id = jnp.where(a_draw == 0, I32(0),
                             jnp.where(a_draw <= 5, I32(1), I32(2)))
        mat = jnp.where(a_draw == 0, I32(0), (a_draw - 1) % 5)
    else:
        press_id, mat = press_id_rule, mat_rule

    # _press_action_rules == _check_press_status then _use_press.
    # step_mono_external's UNMASKED branch instead does
    # _select_state(valid, st, dispatched): where invalid, the press
    # phase (incl. timer ticks) must leave NO trace — predicate every
    # press-phase write by `valid`.
    pred_all = valid if (variant == "external" and not masked) else None

    def gate(x):
        return x if pred_all is None else (x & pred_all)

    new_timer = list(timer)
    new_pmat = list(pmat)
    new_pn = list(pn)
    new_pq = list(pq)
    lanesE = lax.broadcasted_iota(I32, (E,) + ev_cnt.shape, 0)
    for p in range(2):
        busy = timer[p] > 0
        t_dec = jnp.where(busy, timer[p] - 1, timer[p])
        done = gate(busy & (t_dec == 0))
        # event append (fastb._press_bale, events mode) — one (E, BS, L)
        # masked select per buffer
        q_int = (pq[p] * F32(100.0)).astype(I16)
        m16 = pmat[p].astype(I16)
        n16 = pn[p].astype(I16)
        hit = (lanesE == ev_cnt[None]) & done[None]
        ev_mat = jnp.where(hit, m16[None], ev_mat)
        ev_n = jnp.where(hit, n16[None], ev_n)
        ev_q = jnp.where(hit, q_int[None], ev_q)
        ev_cnt = ev_cnt + done.astype(I32)
        new_timer[p] = (t_dec if pred_all is None
                        else jnp.where(pred_all, t_dec, timer[p]))
        new_pmat[p] = jnp.where(done, I32(0), pmat[p])
        new_pn[p] = jnp.where(done, I32(0), pn[p])
        new_pq[p] = jnp.where(done, F32(0.0), pq[p])
    timer, pmat, pn, pq = new_timer, new_pmat, new_pn, new_pq

    # _use_press(press=max(press_id,1), m=mat, pred=press_id != 0)
    press_row = jnp.maximum(press_id, 1)
    pred = gate(press_id != 0)
    p0sel = press_row == 1
    busy_now = jnp.where(p0sel, timer[0], timer[1]) > 0
    go = pred & ~busy_now
    lvl_rows = [cont_t[j] + cont_f[j] for j in range(4)] + [cont_t[4]]
    total_lvl = _row_at(lvl_rows, mat)
    true_m = jnp.where(mat < 4, _row_at(cont_t, mat), total_lvl)
    quality = jnp.where(
        (mat < 4) & (total_lvl > 0),
        true_m.astype(F32) / jnp.maximum(total_lvl, 1).astype(F32),
        F32(0.0))
    press_time = jnp.where(p0sel, I32(cfg_c["press_time_1"]),
                           I32(cfg_c["press_time_2"]))
    lps = jnp.where(go, I32(1), lps)
    lpa = jnp.where(go, total_lvl, lpa)
    for j in range(5):
        cont_t[j] = jnp.where(go & (mat == j), I32(0), cont_t[j])
    for j in range(4):
        cont_f[j] = jnp.where(go & (mat == j) & (mat < 4), I32(0),
                              cont_f[j])
    for p in range(2):
        sel = go & (press_row == (p + 1))
        timer[p] = jnp.where(sel, press_time, timer[p])
        pmat[p] = jnp.where(sel, mat, pmat[p])
        pn[p] = jnp.where(sel, total_lvl, pn[p])
        pq[p] = jnp.where(sel, quality, pq[p])

    # ---- 6. rewards --------------------------------------------------
    # _container_purities on the post-press state
    purities = []
    for j in range(4):
        tot = cont_t[j] + cont_f[j]
        pr_ = cont_t[j].astype(F32) / jnp.maximum(tot, 1).astype(F32)
        purities.append(jnp.where(tot > 0, pr_,
                                  F32(cfg_c["quality_threshold"])))
    score = ((purities[0] - F32(cfg_c["theta"]))
             + (purities[1] - F32(cfg_c["theta"]))
             + (purities[2] - F32(cfg_c["theta"]))
             + (purities[3] - F32(cfg_c["theta"])))
    raw_sort = (score / F32(4.0)) * F32(cfg_c["purity_scaling"])
    # tanh applied OUTSIDE the kernel (see module docstring)

    # _press_reward
    cap = F32(cfg_c["capacity"])
    levels = [cont_t[j] + cont_f[j] for j in range(4)] + [cont_t[4]]
    fills = [lv.astype(F32) / cap for lv in levels]
    catastrophic = jnp.full_like(go, False)
    over95 = jnp.full_like(go, False)
    over90 = jnp.full_like(go, False)
    for f in fills:
        catastrophic = catastrophic | (f > F32(1.0))
        over95 = over95 | (f > F32(0.95))
        over90 = over90 | (f > F32(0.90))
    max_penalty = jnp.where(over95, F32(cfg_c["pen_severe"]),
                            jnp.where(over90, F32(cfg_c["pen_mild"]),
                                      F32(0.0)))
    lv_sum = levels[0] + levels[1] + levels[2] + levels[3] + levels[4]
    overall = lv_sum.astype(F32) / (F32(5.0) * cap)
    state_reward = overall * F32(cfg_c["max_state_reward"])
    bs_ = cfg_c["balesize"]
    num_bales = lpa // I32(bs_)
    rem_b = lpa % I32(bs_)
    dist = jnp.minimum(rem_b, I32(bs_) - rem_b)
    bef = F32(cfg_c["bale_eff"])
    efficiency = (F32(1.0) - F32(4.0) * (dist.astype(F32) / F32(bs_))) * bef
    w = jnp.minimum(num_bales, 3)
    peak = jnp.where(w == 0, F32(0.0),
                     jnp.where(w == 1, F32(1.0 / 3.0),
                               jnp.where(w == 2, F32(2.0 / 3.0),
                                         F32(1.0))))
    action_reward = jnp.where(lps > 0, efficiency + (peak - bef), F32(0.0))
    normal = jnp.clip(state_reward + action_reward, F32(-1.0), F32(1.0))
    press_reward = jnp.where(
        catastrophic, F32(cfg_c["pen_catastrophic"]),
        jnp.where(max_penalty < F32(0.0), max_penalty, normal))
    early = catastrophic | (max_penalty < F32(0.0))
    if variant != "sort":
        # fastb.step_sort never calls _press_reward, so the sort env
        # carries last_press_started/amount forward untouched
        lps = jnp.where(early, lps, I32(0))
        lpa = jnp.where(early, lpa, I32(0))

    # ---- 7. observations ---------------------------------------------
    belt_total = belt_c[0] + belt_c[1] + belt_c[2] + belt_c[3]
    props = [jnp.where(belt_total > 0,
                       belt_c[j].astype(F32)
                       / jnp.maximum(belt_total, 1).astype(F32), F32(0.0))
             for j in range(4)]
    diffs = [purities[j] - F32(cfg_c["quality_threshold"]) for j in range(4)]
    sort_obs = [belt_occ] + props + acc_belt + diffs
    sort_obs = [jnp.clip(o, F32(-1.0), F32(1.0)) for o in sort_obs]
    lev_n = [lv.astype(F32) / cap for lv in levels]
    sorter = [sort_c[j].astype(F32) / F32(cfg_c["stage_capacity"])
              for j in range(4)]
    timers_n = [timer[0].astype(F32) / F32(cfg_c["press_time_1"]),
                timer[1].astype(F32) / F32(cfg_c["press_time_2"])]
    press_obs = lev_n + lev_n + sorter + timers_n
    press_obs = [jnp.clip(o, F32(0.0), F32(1.0)) for o in press_obs]
    if variant == "sort":
        obs = sort_obs                           # 13 rows
    elif variant == "press":
        obs = press_obs                          # 16 rows
    else:
        obs = sort_obs + press_obs               # 29 rows

    # ---- 8. finish -----------------------------------------------------
    cstep = cstep + 1
    term = (cstep >= I32(cfg_c["max_steps"])).astype(I32)
    if variant == "rule":
        a_out = sort_mode * 11 + jnp.where(
            press_id == 0, I32(0), (press_id - 1) * 5 + mat + 1)
    else:
        a_out = action  # the env echoes the action as passed

    # ---- 9. fused autoreset (fastb.with_autoreset/_reset_from_keys) ----
    if autoreset:
        t = term > 0
        key_f, k1f = _split2(key[0], key[1])
        # bernoulli(k1) == uniform(k1, ()) < 0.5; scalar uniform = block
        # (0, 0) word o0 ^ o1 (the sort kernel's scalar recipe)
        b0, b1 = _threefry(k1f[0][None], k1f[1][None],
                           jnp.zeros((1,) + k1f[0].shape, U32),
                           jnp.zeros((1,) + k1f[0].shape, U32))
        first_f = (_bits_to_unit_f32(b0[0] ^ b1[0]) < F32(0.5)).astype(I32)

        def sel(stepped, fresh):
            return jnp.where(t, fresh, stepped)

        zi = jnp.zeros_like(cstep)
        zf = jnp.zeros_like(input_occ)
        z16 = jnp.zeros_like(ev_mat)
        input_c = [sel(x, zi) for x in input_c]
        belt_c = [sel(x, zi) for x in belt_c]
        sort_c = [sel(x, zi) for x in sort_c]
        acc_belt = [sel(acc_belt[j], F32(cfg_c["base_acc"][j]) + zf)
                    for j in range(4)]
        acc_sorter = [sel(acc_sorter[j], F32(cfg_c["base_acc"][j]) + zf)
                      for j in range(4)]
        sort_mode = sel(sort_mode, zi)
        input_occ = sel(input_occ, zf)
        belt_occ = sel(belt_occ, zf)
        cont_t = [sel(x, zi) for x in cont_t]
        cont_f = [sel(x, zi) for x in cont_f]
        timer = [sel(x, zi) for x in timer]
        pmat = [sel(x, zi) for x in pmat]
        pn = [sel(x, zi) for x in pn]
        pq = [sel(x, zf) for x in pq]
        ev_mat = jnp.where(t[None], z16, ev_mat)
        ev_n = jnp.where(t[None], z16, ev_n)
        ev_q = jnp.where(t[None], z16, ev_q)
        ev_cnt = sel(ev_cnt, zi)
        lps = sel(lps, zi)
        lpa = sel(lpa, zi)
        gfirst = sel(gfirst, first_f)
        gidx = sel(gidx, zi)
        gctr = sel(gctr, zi)
        cstep = sel(cstep, zi)
        totin = sel(totin, zi)  # fastb.autoreset zeroes it explicitly
        key = (sel(key[0], key_f[0]), sel(key[1], key_f[1]))

    # ---- write outputs (order must match step_mono); 3-D entries are
    # whole-block writes (the event buffers), 2-D entries per-row ------
    outs = (input_c + belt_c + sort_c + acc_belt + acc_sorter
            + [sort_mode, input_occ, belt_occ]
            + cont_t + cont_f + timer + pmat + pn + pq
            + [ev_mat, ev_n, ev_q] + [ev_cnt, lps, lpa]
            + [gfirst, gidx, gctr, cstep, totin]
            + [key[0], key[1]]
            + obs + [raw_sort, press_reward, purity, a_out, term])
    for r in i:
        v = outs.pop(0)
        if v.ndim == 3:
            r[...] = v
        else:
            r[0] = v
            for j in range(1, r.shape[0]):
                r[j] = outs.pop(0)
    assert not outs, f"{len(outs)} outputs unwritten"


def _cfg_consts(cfg):
    bs = cfg.input_batch_size
    p0 = (0.40, 0.15, 0.35, 0.10)
    p1 = (0.15, 0.40, 0.10, 0.35)
    units0 = tuple(int(np.floor(np.float32(r) * np.float32(bs)))
                   for r in p0)
    units1 = tuple(int(np.floor(np.float32(r) * np.float32(bs)))
                   for r in p1)
    return dict(
        E=cfg.max_press_events,
        steps_per_pattern=cfg.steps_per_pattern,
        units0=units0, units1=units1,
        rem0=bs - sum(units0), rem1=bs - sum(units1),
        base_acc=tuple(cfg.baseline_accuracy),
        boost=cfg.boost,
        noise=cfg.effective_noise,
        quality_threshold=cfg.quality_threshold,
        theta=cfg.purity_threshold_theta,
        purity_scaling=cfg.purity_scaling_factor,
        capacity=cfg.container_capacity,
        stage_capacity=cfg.stage_capacity,
        balesize=cfg.effective_balesize,
        press_time_1=cfg.press_time_1,
        press_time_2=cfg.press_time_2,
        pen_severe=cfg.overflow_penalty_severe,
        pen_mild=cfg.overflow_penalty_mild,
        pen_catastrophic=cfg.overflow_penalty_catastrophic,
        max_state_reward=cfg.max_state_reward,
        bale_eff=cfg.bale_efficiency_factor,
        max_steps=cfg.max_steps,
    )


_MAX_EVENTS = 256  # Event-log depth cap.  The VMEM pressure of deep
# logs is handled by _tile_for's E-aware tile shrink (E*tile bounded by
# the measured-good _EV_TILE_PRODUCT, counting that the 3 i16 event
# arrays appear as input AND output blocks plus pipeline buffering —
# ~6.3 MB/side at E=256/tile=32 had tiles not shrunk); this cap bounds
# the per-step O(E) event-scatter compute so extreme logs don't turn
# every step into an event-log sweep.  Configs beyond it (max_steps
# ~1500+) fall back to the XLA path.


def supported(cfg, n_envs: int) -> bool:
    """Events bale mode, whole 128-lane rows, bounded event log; no
    upper batch cap (grid over _STEP_TILE-row tiles)."""
    return (getattr(cfg, "bale_mode", "full") in ("auto", "events")
            and cfg.max_press_events <= _MAX_EVENTS
            and n_envs % 128 == 0 and n_envs >= 128)


def step_mono(cfg, st, action, *, variant, masked=True, support,
              autoreset=False, interpret=False):
    """Run one full env step through the fused kernel.

    st: fastb.BState (events mode).  ``variant``:
      'external' — monolith with a flat 22-way action (i32[N]);
      'rule'     — closed-loop rule-based monolith (action ignored);
      'sort'     — Env_1 (fastb.step_sort): action is the 2-way sort
                   mode; the masked random press is drawn IN-kernel
                   (fastb.masked_uniform_choice recipe, bitwise);
      'press'    — Env_2 (fastb.step_press, no sort policy): action is
                   the 11-way press choice; ``masked=False`` applies the
                   sanitize (invalid -> no-op press, timers tick).
    Returns (new_st, BStepOut) exactly like the fastb step functions
    (the tanh of the sorting reward is applied on the host-side graph,
    matching fastb._sorting_reward)."""
    from ..core import fastb as FB

    n = st.current_step.shape[0]
    if not supported(cfg, n):
        raise ValueError(
            f"step kernel needs bale_mode='events' and n % 128 == 0 "
            f"(got bale_mode={getattr(cfg, 'bale_mode', 'full')!r}, "
            f"n={n})")
    bs = n // 128
    E = cfg.max_press_events
    tile = _tile_for(bs, E)

    def pack(x, rows, dtype):
        x = jnp.asarray(x, dtype)
        return x.reshape(rows, bs, 128)

    ins = [
        pack(st.input_counts, 4, I32),
        pack(st.belt_counts, 4, I32),
        pack(st.acc_belt, 4, F32),
        pack(st.input_occupancy, 1, F32),
        pack(st.cont_true, 5, I32),
        pack(st.cont_false, 4, I32),
        pack(st.press_timer, 2, I32),
        pack(st.press_mat, 2, I32),
        pack(st.press_n, 2, I32),
        pack(st.press_q, 2, F32),
        pack(st.ev_mat, E, I16),
        pack(st.ev_n, E, I16),
        pack(st.ev_q, E, I16),
        pack(st.ev_cnt, 1, I32),
        pack(st.last_press_started.astype(I32), 1, I32),
        pack(st.last_press_amount, 1, I32),
        pack(st.gen_pattern_first, 1, I32),
        pack(st.gen_pattern_idx, 1, I32),
        pack(st.gen_step_counter, 1, I32),
        pack(st.current_step, 1, I32),
        pack(st.total_input_units, 1, I32),
        pack(st.key.T, 2, U32),
    ]
    if variant != "rule":
        ins.append(pack(jnp.asarray(action, I32), 1, I32))

    vma = jax.typeof(st.current_step).vma
    obs_rows = {"sort": 13, "press": 16}.get(variant, 29)
    out_rows = [
        ("input_counts", 4, I32), ("belt_counts", 4, I32),
        ("sort_counts", 4, I32), ("acc_belt", 4, F32),
        ("acc_sorter", 4, F32), ("sensor_setting", 1, I32),
        ("input_occupancy", 1, F32), ("belt_occupancy", 1, F32),
        ("cont_true", 5, I32), ("cont_false", 4, I32),
        ("press_timer", 2, I32), ("press_mat", 2, I32),
        ("press_n", 2, I32), ("press_q", 2, F32),
        ("ev_mat", E, I16), ("ev_n", E, I16), ("ev_q", E, I16),
        ("ev_cnt", 1, I32), ("lps", 1, I32), ("lpa", 1, I32),
        ("gen_pattern_first", 1, I32), ("gen_pattern_idx", 1, I32),
        ("gen_step_counter", 1, I32), ("current_step", 1, I32),
        ("total_input_units", 1, I32), ("key0", 1, U32), ("key1", 1, U32),
        ("obs", obs_rows, F32), ("raw_sort", 1, F32),
        ("press_reward", 1, F32),
        ("purity", 1, F32), ("action", 1, I32), ("term", 1, I32),
    ]
    out_shape = [jax.ShapeDtypeStruct((r, bs, 128), dt, vma=vma)
                 for _, r, dt in out_rows]

    def blk(rows):
        return pl.BlockSpec((rows, tile, 128), lambda ib: (0, ib, 0),
                            memory_space=pltpu.VMEM)

    kern = partial(
        lambda *refs, cfg_c, variant, masked, support, autoreset: _kernel(
            cfg_c, list(refs), variant=variant, masked=masked,
            support=support, autoreset=autoreset),
        cfg_c=_cfg_consts(cfg), variant=variant, masked=masked,
        support=support, autoreset=autoreset)

    outs = pl.pallas_call(
        kern,
        grid=(bs // tile,),
        out_shape=out_shape,
        in_specs=[blk(x.shape[0]) for x in ins],
        out_specs=[blk(r) for _, r, _ in out_rows],
        interpret=interpret,
    )(*ins)

    o = {name: arr for (name, _, _), arr in zip(out_rows, outs)}

    def unpack(name):
        x = o[name]
        r = x.shape[0]
        return x.reshape(r, n) if r > 1 else x.reshape(n)

    new_st = FB.BState(
        input_counts=unpack("input_counts"),
        belt_counts=unpack("belt_counts"),
        sort_counts=unpack("sort_counts"),
        acc_belt=unpack("acc_belt"),
        acc_sorter=unpack("acc_sorter"),
        sensor_setting=unpack("sensor_setting"),
        input_occupancy=unpack("input_occupancy"),
        belt_occupancy=unpack("belt_occupancy"),
        cont_true=unpack("cont_true"),
        cont_false=unpack("cont_false"),
        press_timer=unpack("press_timer"),
        press_mat=unpack("press_mat"),
        press_n=unpack("press_n"),
        press_q=unpack("press_q"),
        bale_size=None, bale_qual=None, bale_cnt=None,
        ev_mat=unpack("ev_mat"), ev_n=unpack("ev_n"),
        ev_q=unpack("ev_q"), ev_cnt=unpack("ev_cnt"),
        last_press_started=unpack("lps") > 0,
        last_press_amount=unpack("lpa"),
        gen_pattern_first=unpack("gen_pattern_first"),
        gen_pattern_idx=unpack("gen_pattern_idx"),
        gen_step_counter=unpack("gen_step_counter"),
        current_step=unpack("current_step"),
        total_input_units=unpack("total_input_units"),
        key=jnp.stack([unpack("key0"), unpack("key1")], axis=1),
    )
    # the only transcendental, applied exactly as fastb._sorting_reward
    sr = jnp.tanh(unpack("raw_sort") / F32(cfg.tanh_temperature))
    pr = unpack("press_reward")
    terminated = unpack("term") > 0  # pre-reset (autoreset may zero cstep)
    if variant == "sort":
        # fastb.step_sort: reward is the sorting reward alone
        reward, srr, prr = sr, sr, jnp.zeros_like(sr)
    elif variant == "press":
        # fastb.step_press: reward is the press reward alone
        reward, srr, prr = pr, jnp.zeros_like(pr), pr
    else:
        reward, srr, prr = sr + pr, sr, pr
    out = FB.BStepOut(
        obs=unpack("obs").T,
        reward=reward,
        terminated=terminated,
        action=unpack("action"),
        sort_reward=srr,
        press_reward=prr,
        purity=unpack("purity"),
    )
    return new_st, out
