"""Fused full-step Pallas kernel (ops/step_pallas.py): bitwise
equivalence with the XLA fastb path in interpret mode, plus flag
plumbing.  The on-chip bitwise A/B + timing evidence lives in
``artifacts/step_pallas_ab.log`` and is re-asserted in every
``bench.py`` capture.

Interpret mode is slow (the kernel unrolls the E event rows), so the
tests use short episodes (max_steps=36 -> E=9) and few steps; the RNG
chain, sampler, press/event/reward/obs logic are step-count-invariant.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fastb as FB
from marl_sortingenv_tpu.ops import step_pallas as SPK


def _compare(cfg, variant, masked, steps=3, n=128, seed=1):
    support = FB._support_for(cfg)
    st0 = FB.reset_batch(cfg, jax.random.PRNGKey(seed), n)
    rng = np.random.default_rng(seed)
    acts = rng.integers(0, 22, size=(steps, n)).astype(np.int32)
    if variant == "external":
        fx = jax.jit(
            lambda s, a: FB.step_mono_external(cfg, s, a, masked))
        fp = lambda s, a: SPK.step_mono(
            cfg, s, a, variant="external", masked=masked,
            support=support, interpret=True)
    else:
        fx = jax.jit(lambda s, a: FB.step_mono_rule(cfg, s))
        fp = lambda s, a: SPK.step_mono(
            cfg, s, None, variant="rule", support=support, interpret=True)
    st_x = st_p = st0
    for t in range(steps):
        a = jnp.asarray(acts[t])
        st_x, out_x = fx(st_x, a)
        st_p, out_p = fp(st_p, a)
    for nm, a_, b_ in zip(FB.BState._fields, st_x, st_p):
        if a_ is None:
            continue
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_),
                                      err_msg=f"state.{nm}")
    for nm in FB.BStepOut._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(out_x, nm)), np.asarray(getattr(out_p, nm)),
            err_msg=f"out.{nm}")


CFG = load_config(bale_mode="events", max_steps=36)
CFG_N = load_config(bale_mode="events", max_steps=36, noise_sorting=0.05)


def test_step_kernel_rule_bitwise():
    _compare(CFG, "rule", True)


def test_step_kernel_external_masked_bitwise():
    _compare(CFG, "external", True)


def test_step_kernel_external_unmasked_bitwise():
    """The sanitize branch: invalid presses must leave NO trace (the
    _select_state semantics — timers do not tick on invalid actions)."""
    _compare(CFG, "external", False)


def test_step_kernel_noise_bitwise():
    """noise 0.05 exercises the uniform4 draw in the key chain (the
    accuracy section is variant-independent, so one variant suffices)."""
    _compare(CFG_N, "external", True)


def test_step_kernel_grid_tiling_bitwise(monkeypatch):
    """Batches beyond one tile run as a grid of per-tile programs."""
    monkeypatch.setattr(SPK, "_STEP_TILE", 1)
    _compare(CFG, "rule", True, steps=2, n=256)


def test_step_kernel_flag_resolution():
    cfg = CFG
    st = FB.reset_batch(cfg, jax.random.PRNGKey(0), 128)
    # CPU backend: auto resolves to the XLA path
    assert not FB._use_step_kernel(cfg, st)
    assert not FB._use_step_kernel(cfg.with_(step_kernel="xla"), st)
    assert FB._use_step_kernel(cfg.with_(step_kernel="pallas"), st)
    # full bale mode unsupported (explicit since the default is "auto")
    st_full = FB.reset_batch(load_config(max_steps=36, bale_mode="full"),
                             jax.random.PRNGKey(0), 128)
    with pytest.raises(ValueError, match="events"):
        FB._use_step_kernel(load_config(max_steps=36, bale_mode="full",
                                        step_kernel="pallas"), st_full)
    # ragged batch unsupported
    st_r = FB.reset_batch(cfg, jax.random.PRNGKey(0), 100)
    with pytest.raises(ValueError, match="128"):
        FB._use_step_kernel(cfg.with_(step_kernel="pallas"), st_r)


def test_step_kernel_via_fastb_gate():
    """Forced step_kernel='pallas' through the public fastb entry points
    (interpret monkey-wiring not needed: interpret=False fails on CPU,
    so drive step_pallas.step_mono directly in interpret and compare
    against the gated-XLA result)."""
    cfg = CFG.with_(step_kernel="xla")
    st = FB.reset_batch(cfg, jax.random.PRNGKey(3), 128)
    st_x, out_x = jax.jit(lambda s: FB.step_mono_rule(cfg, s))(st)
    st_p, out_p = SPK.step_mono(cfg, st, None, variant="rule",
                                support=FB._support_for(cfg),
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(out_x.obs),
                                  np.asarray(out_p.obs))
    np.testing.assert_array_equal(np.asarray(st_x.key), np.asarray(st_p.key))


def test_step_kernel_fused_autoreset_bitwise():
    """autoreset=True fuses the terminated-instance reset (split +
    bernoulli + ~26-leaf select) into the kernel; must equal
    fastb.with_autoreset over episode boundaries bit for bit."""
    cfg = load_config(bale_mode="events", max_steps=3)
    support = FB._support_for(cfg)
    n, steps = 128, 5
    st0 = FB.reset_batch(cfg, jax.random.PRNGKey(5), n)
    fx = jax.jit(FB.with_autoreset(
        cfg, lambda c, s, a: FB.step_mono_rule(c, s)))
    st_x = st_p = st0
    zero = jnp.zeros(n, jnp.int32)
    for t in range(steps):
        st_x, out_x = fx(st_x, zero)
        st_p, out_p = SPK.step_mono(cfg, st_p, None, variant="rule",
                                    support=support, autoreset=True,
                                    interpret=True)
        np.testing.assert_array_equal(np.asarray(out_x.terminated),
                                      np.asarray(out_p.terminated), t)
    for nm, a_, b_ in zip(FB.BState._fields, st_x, st_p):
        if a_ is None:
            continue
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_),
                                      err_msg=f"state.{nm}")
    # several envs must actually have reset during the run
    assert int(np.asarray(st_p.current_step).max()) < steps
    assert int(np.asarray(st_p.current_step).min()) >= 0


def test_step_kernel_event_log_vmem_bound():
    """Very long episodes grow the (E, tile, 128) event blocks; the
    kernel must refuse rather than overflow VMEM (falls back to XLA)."""
    big = load_config(bale_mode="events", max_steps=20_000)
    assert big.max_press_events > SPK._MAX_EVENTS
    assert not SPK.supported(big, 4096)
    st = FB.reset_batch(big, jax.random.PRNGKey(0), 128)
    assert not FB._use_step_kernel(big, st)
    with pytest.raises(ValueError):
        FB._use_step_kernel(big.with_(step_kernel="pallas"), st)


def test_step_kernel_press_completion_events_bitwise():
    """The press-completion / event-append branch (ADVICE r4): with
    press times 1/2 and a small balesize, presses START and FINISH
    within the horizon, so ev_mat/ev_n/ev_q/ev_cnt take real writes on
    both sides instead of comparing trivially-zero.  The assert at the
    end proves the branch was actually crossed."""
    cfg = load_config(bale_mode="events", max_steps=24,
                      press_time_1=1, press_time_2=2, balesize=16)
    support = FB._support_for(cfg)
    n, steps = 128, 8
    st0 = FB.reset_batch(cfg, jax.random.PRNGKey(7), n)
    fx = jax.jit(lambda s: FB.step_mono_rule(cfg, s))
    st_x = st_p = st0
    for t in range(steps):
        st_x, out_x = fx(st_x)
        st_p, out_p = SPK.step_mono(cfg, st_p, None, variant="rule",
                                    support=support, interpret=True)
    for nm, a_, b_ in zip(FB.BState._fields, st_x, st_p):
        if a_ is None:
            continue
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_),
                                      err_msg=f"state.{nm}")
    # the branch must have fired: some env appended at least one event
    assert int(np.asarray(st_x.ev_cnt).max()) > 0, \
        "no press completed — the event-append branch was not exercised"


def test_step_kernel_variant_config_bitwise():
    """The kernel bakes config constants (floor(ratio*batch) units and
    remainder per pattern, press times, balesize, capacities, reward
    params); a non-default config must stay bitwise with the XLA path
    (pattern units computed in f32 like fastb._generate_input — e.g.
    floor(0.35f * 80f) semantics)."""
    cfg = load_config(bale_mode="events", max_steps=36,
                      input_batch_size=80, press_time_1=5, press_time_2=7,
                      balesize=120, container_capacity=500)
    _compare(cfg, "rule", True, steps=3)
    _compare(cfg, "external", True, steps=3, seed=2)


def _compare_variant(cfg, variant, masked, steps, n=128, seed=11,
                     n_actions=None):
    """XLA vs kernel bitwise for the sort/press variants."""
    support = FB._support_for(cfg)
    st0 = FB.reset_batch(cfg, jax.random.PRNGKey(seed), n)
    rng = np.random.default_rng(seed)
    na = n_actions or (2 if variant == "sort" else 11)
    acts = rng.integers(0, na, size=(steps, n)).astype(np.int32)
    if variant == "sort":
        fx = jax.jit(lambda s, a: FB.step_sort(cfg, s, a))
    else:
        fx = jax.jit(
            lambda s, a: FB.step_press(cfg, s, a, None, masked))
    fp = lambda s, a: SPK.step_mono(
        cfg, s, a, variant=variant, masked=masked, support=support,
        interpret=True)
    st_x = st_p = st0
    for t in range(steps):
        a = jnp.asarray(acts[t])
        st_x, out_x = fx(st_x, a)
        st_p, out_p = fp(st_p, a)
    for nm, a_, b_ in zip(FB.BState._fields, st_x, st_p):
        if a_ is None:
            continue
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_),
                                      err_msg=f"state.{nm}")
    for nm in FB.BStepOut._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(out_x, nm)), np.asarray(getattr(out_p, nm)),
            err_msg=f"out.{nm}")
    return st_x


def test_step_kernel_sort_variant_bitwise():
    """Env_1 (fastb.step_sort) through the kernel: the in-kernel masked
    random press (split + scalar uniform + uniform-rank pick) must match
    fastb._sample_masked_press bit for bit, and the drawn presses must
    actually start (press_timer nonzero somewhere)."""
    cfg = load_config(bale_mode="events", max_steps=36, balesize=24)
    st = _compare_variant(cfg, "sort", True, steps=4)
    assert int(np.asarray(st.press_timer).max()) > 0, \
        "no press ever started — the masked draw was not exercised"


def test_step_kernel_sort_variant_noise_bitwise():
    cfg = load_config(bale_mode="events", max_steps=36, balesize=24,
                      noise_sorting=0.05)
    _compare_variant(cfg, "sort", True, steps=3, seed=13)


def test_step_kernel_press_variant_masked_bitwise():
    cfg = load_config(bale_mode="events", max_steps=36, balesize=24)
    _compare_variant(cfg, "press", True, steps=4)


def test_step_kernel_press_variant_sanitize_bitwise():
    """Env_2 unmasked: invalid presses become no-ops but timers still
    tick — the sanitize semantics differ from the mono freeze quirk."""
    cfg = load_config(bale_mode="events", max_steps=36, balesize=24)
    _compare_variant(cfg, "press", False, steps=4, seed=17)


def test_step_kernel_sort_press_event_append_bitwise():
    """Short press times force completions + event appends through the
    sort/press kernel paths too."""
    cfg = load_config(bale_mode="events", max_steps=24,
                      press_time_1=1, press_time_2=2, balesize=16)
    st_s = _compare_variant(cfg, "sort", True, steps=8, seed=19)
    st_p = _compare_variant(cfg, "press", True, steps=8, seed=23)
    assert int(np.asarray(st_s.ev_cnt).max()) > 0
    assert int(np.asarray(st_p.ev_cnt).max()) > 0
