"""Batching, auto-reset, and rollout wrappers around the variant steps.

The scaling axis of this framework is the environment batch (SURVEY.md
§2.8): thousands of lockstep instances per chip via ``vmap``, time via
``lax.scan``.  There is no cross-instance physics, so the batched step is
embarrassingly parallel and shards trivially over a device mesh
(``parallel/``).

Auto-reset semantics: episodes end only at ``max_steps`` (overflow
termination is disabled by default in the reference, SURVEY.md §2.1).  A
terminated instance is reset in the same call that reports the terminal
step, like Gymnasium's autoreset wrapper but fused into the jitted step.
The reference's ``reset(seed=None)`` keeps the five RNG streams and
recreates the input generator from OS entropy (``env_super.py:375-378``);
on device we keep *all six* streams running and redraw the pattern
permutation from the continuing generator stream — deterministic and
reproducible, which the reference's unseeded reset is not.  Parity claims
therefore cover explicitly seeded resets (the BASELINE configs); training
rollouts use this deterministic auto-reset.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import dynamics as D
from .rng import random_interval32
from .state import EnvState
from ..config.config import SimConfig

I32 = jnp.int32
F64 = jnp.float64


def autoreset(cfg: SimConfig, st: EnvState) -> EnvState:
    """Reset plant state, keep RNG streams (see module docstring)."""
    j, gen_rng = random_interval32(st.gen_rng, jnp.uint32(1))
    base = jnp.array([1, 2], I32)
    swapped = jnp.array([2, 1], I32)
    pattern_seq = jnp.where(j == 0, swapped, base)

    zeros4 = jnp.zeros(4, I32)
    return st._replace(
        input_counts=zeros4,
        belt_counts=zeros4,
        sort_counts=zeros4,
        acc_belt=jnp.asarray(cfg.baseline_accuracy, F64),
        acc_sorter=jnp.asarray(cfg.baseline_accuracy, F64),
        sensor_setting=jnp.zeros((), I32),
        input_occupancy=jnp.zeros((), F64),
        belt_occupancy=jnp.zeros((), F64),
        cont_true=jnp.zeros(5, I32),
        cont_false=zeros4,
        press_timer=jnp.zeros(2, I32),
        press_mat=jnp.zeros(2, I32),
        press_n=jnp.zeros(2, I32),
        press_q=jnp.zeros(2, F64),
        bale_size=jnp.zeros((5, cfg.max_bales), I32),
        bale_qual=jnp.zeros((5, cfg.max_bales), I32),
        bale_cnt=jnp.zeros(5, I32),
        last_press_started=jnp.zeros((), bool),
        last_press_amount=jnp.zeros((), I32),
        press_penalty_flag=jnp.zeros((), I32),
        gen_pattern_seq=pattern_seq,
        gen_pattern_idx=jnp.zeros((), I32),
        gen_step_counter=jnp.zeros((), I32),
        current_step=jnp.zeros((), I32),
        total_input_units=jnp.zeros((), I32),
        error_flag=st.error_flag,
        gen_rng=gen_rng,
    )


def with_autoreset(cfg: SimConfig, step_fn: Callable):
    """Wrap a single-instance step so terminated instances reset in-place.
    Observation returned on the terminal step is the *reset* observation
    for the next episode (standard vectorized-env convention); the
    terminal observation remains available as ``out.obs`` semantics are
    preserved via ``final_obs``."""

    def stepped(st, action):
        st, out = step_fn(cfg, st, action)
        reset_st = autoreset(cfg, st)
        st = jax.tree.map(
            lambda a, b: jnp.where(out.terminated, b, a), st, reset_st
        )
        return st, out

    return stepped


def with_overflow_termination(cfg: SimConfig, step_fn: Callable,
                              variant: str = "mono"):
    """``step(check_overflow=True)`` semantics (reference
    env_1_sort.py:133-142, env_2_press.py:145-153,
    env_monolith.py:265-272): if any container exceeds capacity after the
    step, the episode terminates with ``overflow_termination_penalty``
    (-10), logged as (0, -10) for sort/press envs and (-5, -5) for the
    monolith.

    Deviation note: the reference checks overflow *before* computing the
    normal rewards, so its terminal step leaves the last-press flags
    unreset; this wrapper replaces the already-computed rewards, which is
    equivalent at episode granularity (the flag difference only matters
    after termination).  No reference caller enables this path
    (SURVEY.md §2.1)."""

    def stepped(st, action):
        st, out = step_fn(cfg, st, action)
        overflow = D.detect_overflow(cfg, st)
        pen = jnp.asarray(cfg.overflow_termination_penalty, F64)
        if variant == "mono":
            sr = jnp.where(overflow, pen / 2.0, out.sort_reward)
            pr = jnp.where(overflow, pen / 2.0, out.press_reward)
        elif variant == "sort":
            sr = jnp.where(overflow, 0.0, out.sort_reward)
            pr = jnp.where(overflow, pen, out.press_reward)
        else:
            sr = jnp.where(overflow, 0.0, out.sort_reward)
            pr = jnp.where(overflow, pen, out.press_reward)
        out = out._replace(
            reward=jnp.where(overflow, pen, out.reward),
            sort_reward=sr,
            press_reward=pr,
            terminated=out.terminated | overflow,
        )
        return st, out

    return stepped


def batched_step(cfg: SimConfig, step_fn: Callable, auto_reset: bool = True):
    """vmap a variant step over a leading instance axis."""
    single = with_autoreset(cfg, step_fn) if auto_reset else (
        lambda st, a: step_fn(cfg, st, a)
    )
    return jax.vmap(single)


def rollout(cfg: SimConfig, step_fn: Callable, st: EnvState, actions,
            auto_reset: bool = True):
    """Scan a batched step over time.  ``actions``: [T, N, ...] (or [T]
    scalars for unbatched state).  Returns (final state, stacked StepOut
    with leading [T, N])."""
    step = batched_step(cfg, step_fn, auto_reset)

    def body(st, a):
        st, out = step(st, a)
        return st, out

    return lax.scan(body, st, actions)


def rollout_policy(cfg: SimConfig, step_fn: Callable, st: EnvState,
                   policy_fn: Callable, obs0, pstate0, n_steps: int,
                   auto_reset: bool = True):
    """Closed-loop rollout: ``policy_fn(obs_batch, mask_batch, pstate) ->
    (actions, aux, pstate')`` runs inside the scan, fused with the env
    step — observations and masks never leave the device."""
    step = batched_step(cfg, step_fn, auto_reset)
    masks = jax.vmap(lambda s: D.press_action_masks(cfg, s))

    def body(carry, _):
        st, obs, pstate = carry
        actions, aux, pstate = policy_fn(obs, masks(st), pstate)
        st, out = step(st, actions)
        return (st, out.obs, pstate), (out, actions, aux)

    (st, obs, pstate), ys = lax.scan(
        body, (st, obs0, pstate0), None, length=n_steps)
    return (st, obs, pstate), ys
