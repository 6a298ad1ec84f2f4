"""Event-log bale mode (cfg.bale_mode="events") is lossless vs full mode.

The fastb engine's dominant per-step HBM traffic is the (5, MAX_BALES, N)
bale ring-buffer rewrite (press path ~60% of the step in the round-3 TPU
ablation).  Event mode replaces it with a compact (E, N) press-event log;
these tests drive both modes with identical RNG keys and assert

* every step output (obs / reward / terminated / purity) is bitwise equal,
* every non-bale state leaf is bitwise equal at the end,
* the host replay (core.bale_events.rebuild_bales) reproduces the
  full-mode bale arrays bitwise — including the merge-into-last-bale and
  own-remainder-bale branches of reference env_super.py:661-687, and
* the event log never overflows its static bound (config.max_press_events).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import bale_events as BE
from marl_sortingenv_tpu.core import fastb as FB

N = 8


def _cfgs(**kw):
    # full mode must be requested explicitly since bale_mode defaults to
    # "auto" (-> events on fastb, round 5)
    return (load_config(noise_sorting=0.0, balesize=200,
                        bale_mode="full", **kw),
            load_config(noise_sorting=0.0, balesize=200,
                        bale_mode="events", **kw))


def _rollout(cfg, step_fn, n_steps, actions=None, seed=0):
    st = FB.reset_batch(cfg, jax.random.PRNGKey(seed), N)
    stepped = FB.with_autoreset(cfg, step_fn)

    def body(st, a):
        st, out = stepped(st, a)
        return st, (out.obs, out.reward, out.terminated, out.purity)

    if actions is None:
        actions = jnp.zeros((n_steps, N), jnp.int32)
    st, outs = jax.jit(lambda s, a: lax.scan(body, s, a))(st, actions)
    return st, outs


def _assert_outs_equal(a, b):
    for name, x, y in zip(("obs", "reward", "terminated", "purity"), a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)


def _assert_nonbale_state_equal(stf, ste):
    for name, x, y in zip(FB.BState._fields, stf, ste):
        if name.startswith(("bale_", "ev_")):
            continue
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)


@pytest.mark.parametrize("n_steps", [150])  # 2.5 episodes: crosses autoreset
def test_mono_rule_event_mode_lossless(n_steps):
    cfg_f, cfg_e = _cfgs(max_steps=60)
    stf, outf = _rollout(cfg_f, lambda c, s, a: FB.step_mono_rule(c, s), n_steps)
    ste, oute = _rollout(cfg_e, lambda c, s, a: FB.step_mono_rule(c, s), n_steps)
    _assert_outs_equal(outf, oute)
    _assert_nonbale_state_equal(stf, ste)

    assert int(np.asarray(ste.ev_cnt).max()) <= cfg_e.max_press_events
    size, qual, cnt = BE.rebuild_bales(
        cfg_e, ste.ev_mat, ste.ev_n, ste.ev_q, ste.ev_cnt,
        max_bales=cfg_f.max_bales)
    np.testing.assert_array_equal(size, np.asarray(stf.bale_size))
    np.testing.assert_array_equal(qual, np.asarray(stf.bale_qual))
    np.testing.assert_array_equal(cnt, np.asarray(stf.bale_cnt))
    # at least one press must actually have fired for this test to bite
    assert int(np.asarray(ste.ev_cnt).sum()) > 0
    assert int(cnt.sum()) > 0


@pytest.mark.parametrize("masked", [True, False])
def test_mono_external_event_mode_lossless(masked):
    """External-action path (exercises _select_state incl. the unmasked
    invalid-action timer-freeze quirk) with uniform random actions."""
    cfg_f, cfg_e = _cfgs(max_steps=50)
    n_steps = 120
    rng = np.random.default_rng(7)
    acts = jnp.asarray(rng.integers(0, 22, size=(n_steps, N)), jnp.int32)
    step = lambda c, s, a: FB.step_mono_external(c, s, a, use_action_masking=masked)
    stf, outf = _rollout(cfg_f, step, n_steps, actions=acts, seed=3)
    ste, oute = _rollout(cfg_e, step, n_steps, actions=acts, seed=3)
    _assert_outs_equal(outf, oute)
    _assert_nonbale_state_equal(stf, ste)
    size, qual, cnt = BE.rebuild_bales(
        cfg_e, ste.ev_mat, ste.ev_n, ste.ev_q, ste.ev_cnt,
        max_bales=cfg_f.max_bales)
    np.testing.assert_array_equal(size, np.asarray(stf.bale_size))
    np.testing.assert_array_equal(qual, np.asarray(stf.bale_qual))
    np.testing.assert_array_equal(cnt, np.asarray(stf.bale_cnt))


def test_event_mode_material_conservation():
    """Full-system audit in event mode (reference
    check_material_conservation, env_super.py:243-287): every input unit
    is in the stages, the containers, a loaded press, or a press event —
    without autoreset so total_input_units spans the whole run."""
    cfg = load_config(noise_sorting=0.0, balesize=200, max_steps=10_000,
                      bale_mode="events", max_press_events=256)
    st = FB.reset_batch(cfg, jax.random.PRNGKey(5), N)

    def body(st, _):
        st, out = FB.step_mono_rule(cfg, st)
        return st, out.reward

    st, _ = jax.jit(lambda s: lax.scan(body, s, None, length=400))(st)
    total_in = np.asarray(st.total_input_units).astype(np.int64)
    # sorting-stage counts are stale post-sort (reference audits pre-sort,
    # env_super.py:463) — same exclusion as test_material_conservation_batched
    staged = (np.asarray(st.input_counts) + np.asarray(st.belt_counts)).sum(0)
    contained = np.asarray(st.cont_true).sum(0) + np.asarray(st.cont_false).sum(0)
    in_press = np.asarray(st.press_n).sum(0)
    in_events = np.asarray(st.ev_n).astype(np.int64).sum(0)
    np.testing.assert_array_equal(total_in,
                                  staged + contained + in_press + in_events)
    assert int(np.asarray(st.ev_cnt).max()) <= cfg.max_press_events


def test_events_to_full_roundtrip_and_guards():
    cfg_f, cfg_e = _cfgs(max_steps=40)
    ste, _ = _rollout(cfg_e, lambda c, s, a: FB.step_mono_rule(c, s), 90, seed=1)
    with pytest.raises(ValueError, match="full-bale-mode"):
        FB.to_batch_first(ste)
    full = BE.events_to_full(cfg_e.with_(max_bales=cfg_f.max_bales), ste)
    assert full.ev_cnt is None and full.bale_size is not None
    bf = FB.to_batch_first(full)              # now converts fine
    assert bf.bale_size.shape[0] == N
    # full-mode state passes through events_to_full unchanged
    stf, _ = _rollout(cfg_f, lambda c, s, a: FB.step_mono_rule(c, s), 90, seed=1)
    assert BE.events_to_full(cfg_f, stf) is stf
    np.testing.assert_array_equal(np.asarray(full.bale_size),
                                  np.asarray(stf.bale_size))


def test_event_capacity_bound_documented():
    """The static event capacity covers the worst case: a press finish
    every press_time steps for the whole episode."""
    cfg = load_config(max_steps=200)
    assert cfg.max_press_events >= 200 // 12 + 200 // 15 + 2
