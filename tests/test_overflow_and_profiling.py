"""Overflow-termination wrapper semantics + profiling utilities."""

import numpy as np
import jax
import jax.numpy as jnp

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import state as S, step as ST, wrappers as W
from marl_sortingenv_tpu.utils.profiling import Throughput


def test_overflow_terminates_with_penalty():
    # tiny containers so overflow happens quickly under no-op pressing
    cfg = load_config(max_steps=500, noise_sorting=0.0, balesize=200,
                      container_capacity=60)
    st = S.reset(cfg, 0)
    stepped = W.with_overflow_termination(
        cfg, lambda c, s, a: ST.step_mono_external(c, s, a, True), "mono")
    done_at = None
    for t in range(40):
        st, out = jax.jit(stepped)(st, jnp.int32(0))  # no-op press forever
        if bool(out.terminated):
            done_at = t
            assert float(out.reward) == cfg.overflow_termination_penalty
            assert float(out.sort_reward) == cfg.overflow_termination_penalty / 2
            break
    assert done_at is not None and done_at < 39


def test_overflow_wrapper_consistent_with_detector():
    from marl_sortingenv_tpu.core import dynamics as D

    cfg = load_config(max_steps=120, noise_sorting=0.0)
    st = S.reset(cfg, 1)
    stepped = W.with_overflow_termination(
        cfg, lambda c, s, a: ST.step_mono_rule(c, s), "mono")
    f = jax.jit(stepped)
    det = jax.jit(lambda s: D.detect_overflow(cfg, s))
    for t in range(120):
        st, out = f(st, jnp.int32(0))
        over = bool(det(st))
        if over:
            assert bool(out.terminated)
            assert float(out.reward) == cfg.overflow_termination_penalty
        elif t < 119:
            assert not bool(out.terminated)
        if bool(out.terminated):
            break


def test_throughput_counter():
    tp = Throughput()
    tp.start()
    x = jnp.ones(8)
    tp.tick(100, sync=x)
    assert tp.rate() > 0
