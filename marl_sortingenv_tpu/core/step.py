"""Jitted step functions for the three environment variants.

Each variant of the reference (``env_1_sort.py``, ``env_2_press.py``,
``env_monolith.py``) shares one dynamics core parameterized by the action
source; the reference's five monolith action-source paths
(``env_monolith.py:125-225``) become *statically specialized* step
functions (separate jit specializations, no runtime branching on mode).

Signature convention::

    step_x(cfg, state, action, ...) -> (state', StepOut)

with ``StepOut`` carrying obs/reward/terminated plus the per-step log
fields the reference records (``info['action']``, press log codes, the
sorting purity appended to ``reward_data['Accuracy']``).

Embedded frozen policies (the hierarchical mechanism of
``env_2_press.py:106-116`` and the modular monolith path) are pure MLP
forwards evaluated *inside* the jitted step; pass parameter pytrees via
the ``*_policy`` arguments (None statically removes that branch).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import dynamics as D
from . import rng as R
from .state import EnvState
from ..config.config import SimConfig

I32 = jnp.int32
F64 = jnp.float64


class StepOut(NamedTuple):
    obs: jax.Array        # f32, 13/16/29 depending on variant
    reward: jax.Array     # f64
    terminated: jax.Array  # bool
    action: jax.Array     # i32: chosen action (info['action'])
    press_log: jax.Array  # i32: executed press code / 111 / 222 / 0
    purity: jax.Array     # f64: sort_material mean purity ('Accuracy' log)
    sort_reward: jax.Array  # f64 (monolith logs components separately)
    press_reward: jax.Array  # f64


def _common_prelude(cfg: SimConfig, st: EnvState) -> EnvState:
    """input rule draw + material flow (both run first in every variant's
    step: env_1_sort.py:104-107, env_2_press.py:96-99,
    env_monolith.py:114-115)."""
    st = D.input_action_rules(cfg, st)
    st = D.update_environment(cfg, st)
    return st


def _apply_sort(cfg: SimConfig, st: EnvState, sort_mode) -> Tuple[jax.Array, EnvState]:
    st = st._replace(sensor_setting=jnp.asarray(sort_mode, I32))
    st = D.update_accuracy(cfg, st)
    purity, st = D.sort_material(cfg, st)
    return purity, st


def _finish(cfg: SimConfig, st: EnvState) -> Tuple[EnvState, jax.Array]:
    st = st._replace(current_step=st.current_step + 1)
    terminated = st.current_step >= cfg.max_steps
    return st, terminated


def _mlp_predict(policy, obs) -> jax.Array:
    """Deterministic SB3 ``predict``: argmax over action logits.

    ``policy`` is a callable ``(obs_f32) -> logits`` (e.g. a bound flax
    module or ``models.mlp.policy_logits`` partial)."""
    return jnp.argmax(policy(obs)).astype(I32)


def _masked_mlp_predict(policy, obs, mask) -> jax.Array:
    logits = policy(obs)
    neg = jnp.finfo(logits.dtype).min
    return jnp.argmax(jnp.where(mask, logits, neg)).astype(I32)


# ---------------------------------------------------------------------------
# Env_1_Sorting (reference env_1_sort.py:97-154)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0,))
def step_sort(cfg: SimConfig, st: EnvState, action) -> Tuple[EnvState, StepOut]:
    """Agent picks the sort mode; press side samples a random *masked*
    action from rng_pressing (env_1_sort.py:124-126); reward is the
    sorting reward only.

    Jitted (static cfg) like every other step variant: the host wrappers
    call step functions eagerly per step, and an unjitted step re-traces
    its inner while_loops on every call (~0.8 s/step vs ~15 ms jitted)."""
    st = _common_prelude(cfg, st)
    purity, st = _apply_sort(cfg, st, action)

    press_id, mat, st = D.sample_masked_press_action(cfg, st)
    log, st = D.press_action_rules(cfg, st, press_id, mat)

    reward = D.calculate_sorting_reward(cfg, st)
    obs = D.get_sort_obs(cfg, st)
    st, terminated = _finish(cfg, st)
    return st, StepOut(
        obs=obs,
        reward=reward,
        terminated=terminated,
        action=jnp.asarray(action, I32),
        press_log=log,
        purity=purity,
        sort_reward=reward,
        press_reward=jnp.zeros((), F64),
    )


# ---------------------------------------------------------------------------
# Env_2_Pressing (reference env_2_press.py:88-165)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _step_press_impl(cfg, st, action, sort_policy_params, has_sort_agent,
                     use_action_masking, sort_policy_apply):
    st = _common_prelude(cfg, st)

    if has_sort_agent:
        sort_obs = D.get_sort_obs(cfg, st)
        sort_mode = _mlp_predict(
            lambda o: sort_policy_apply(sort_policy_params, o), sort_obs
        )
    else:
        sort_mode = D.sorting_rules(st)

    purity, st = _apply_sort(cfg, st, sort_mode)

    a = jnp.asarray(action, I32)
    if use_action_masking:
        press_id, mat = D.press_discrete_to_action(a)
        invalid_code = jnp.zeros((), I32)
    else:
        press_id, mat, was_invalid, invalid_code = D.sanitize_press_action(cfg, st, a)
    log, st = D.press_action_rules(cfg, st, press_id, mat)
    log = jnp.where(invalid_code != 0, invalid_code, log)

    reward, st = D.calculate_press_reward(cfg, st)
    obs = D.get_press_obs(cfg, st)
    st, terminated = _finish(cfg, st)
    return st, StepOut(
        obs=obs,
        reward=reward,
        terminated=terminated,
        action=a,
        press_log=log,
        purity=purity,
        sort_reward=jnp.zeros((), F64),
        press_reward=reward,
    )


def step_press(cfg: SimConfig, st: EnvState, action,
               sort_policy: Optional[Tuple[Any, Any]] = None,
               use_action_masking: bool = True) -> Tuple[EnvState, StepOut]:
    """Sort side driven by the frozen sorting agent if provided (the
    hierarchical-control boundary, env_2_press.py:106-109), else by the
    rule; agent's press action is executed (sanitized when masking is
    off)."""
    if sort_policy is None:
        return _step_press_impl(cfg, st, action, None, False,
                                use_action_masking, None)
    apply_fn, params = sort_policy
    return _step_press_impl(cfg, st, action, params, True,
                            use_action_masking, apply_fn)


# ---------------------------------------------------------------------------
# Env_3_Monolith (reference env_monolith.py:109-284)
# ---------------------------------------------------------------------------

def _mono_apply(cfg, st, sort_mode, press_id, mat, skip_press, flat_action,
                check_overflow=False):
    purity, st = _apply_sort(cfg, st, sort_mode)

    # an invalid (sanitized) external action skips press_action_rules
    # entirely — including check_press_status, so press timers do NOT
    # tick on that step (env_monolith.py:237-243 call nothing when
    # press_action_tuple is None)
    log_exec, dispatched = D.press_action_rules(cfg, st, press_id, mat)
    st = jax.tree.map(
        lambda a, b: jnp.where(skip_press, a, b), st, dispatched
    )
    log = jnp.where(skip_press, 0, log_exec)

    sort_reward = D.calculate_sorting_reward(cfg, st)
    press_reward, st = D.calculate_press_reward(cfg, st)
    reward = sort_reward + press_reward
    obs = D.get_mono_obs(cfg, st)
    st, terminated = _finish(cfg, st)
    return st, StepOut(
        obs=obs,
        reward=reward,
        terminated=terminated,
        action=jnp.asarray(flat_action, I32),
        press_log=log,
        purity=purity,
        sort_reward=sort_reward,
        press_reward=press_reward,
    )


@partial(jax.jit, static_argnums=(0, 3))
def step_mono_external(cfg: SimConfig, st: EnvState, action,
                       use_action_masking: bool = True):
    """Path 1 (env_monolith.py:125-142): flat action from the learner.
    ``sort = a // 11``, ``press = a % 11``; without masking the press part
    is sanitized and an invalid action skips the press dispatch."""
    st = _common_prelude(cfg, st)
    a = jnp.asarray(action, I32)
    sort_mode = a // 11
    press_disc = a % 11
    if use_action_masking:
        press_id, mat = D.press_discrete_to_action(press_disc)
        skip = jnp.zeros((), bool)
        inv_code = jnp.zeros((), I32)
    else:
        press_id, mat, skip, inv_code = D.sanitize_press_action(cfg, st, press_disc)
    st, out = _mono_apply(cfg, st, sort_mode, press_id, mat, skip, a)
    return st, out._replace(press_log=jnp.where(skip, inv_code, out.press_log))


@partial(jax.jit, static_argnums=(0,))
def step_mono_rule(cfg: SimConfig, st: EnvState):
    """Path 4 (env_monolith.py:166-184): rule-based sorting + rule-based
    pressing (first free press x fullest container)."""
    st = _common_prelude(cfg, st)
    sort_mode = D.sorting_rules(st)
    press_id, mat = D.check_container_level(cfg, st)
    flat = sort_mode * 11 + jnp.where(
        press_id == 0, 0, (press_id - 1) * 5 + mat + 1
    )
    return _mono_apply(cfg, st, sort_mode, press_id, mat,
                       jnp.zeros((), bool), flat)


def _mono_prelude_and_decide_model(cfg, st, sort_policy, press_policy,
                                   use_action_masking, press_is_maskable):
    """Path 5 (env_monolith.py:186-221): modular agents with random
    fallbacks (rng_sorting / rng_pressing)."""
    st = _common_prelude(cfg, st)

    if sort_policy is not None:
        apply_fn, params = sort_policy
        sort_mode = _mlp_predict(lambda o: apply_fn(params, o),
                                 D.get_sort_obs(cfg, st))
    else:
        # fallback: rng_sorting.choice([0, 1]) (env_monolith.py:195)
        idx, rs = R.choice_n(st.rng_sorting, 2)
        sort_mode = idx.astype(I32)
        st = st._replace(rng_sorting=rs)

    if press_policy is not None:
        apply_fn, params = press_policy
        press_obs = D.get_press_obs(cfg, st)
        if use_action_masking and press_is_maskable:
            mask = D.press_action_masks(cfg, st)
            press_disc = _masked_mlp_predict(
                lambda o: apply_fn(params, o), press_obs, mask
            )
        else:
            press_disc = _mlp_predict(lambda o: apply_fn(params, o), press_obs)
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

    return st, sort_mode, press_disc


@partial(jax.jit, static_argnums=(0, 3, 5, 6, 7))
def _step_mono_model_impl(cfg, st, sort_params, sort_apply,
                          press_params, press_apply,
                          use_action_masking, press_is_maskable):
    sort_policy = None if sort_apply is None else (sort_apply, sort_params)
    press_policy = None if press_apply is None else (press_apply, press_params)
    st, sort_mode, press_disc = _mono_prelude_and_decide_model(
        cfg, st, sort_policy, press_policy, use_action_masking,
        press_is_maskable,
    )
    press_id, mat = D.press_discrete_to_action(press_disc)
    flat = sort_mode * 11 + press_disc
    return _mono_apply(cfg, st, sort_mode, press_id, mat,
                       jnp.zeros((), bool), flat)


def step_mono_model(cfg: SimConfig, st: EnvState,
                    sort_policy=None, press_policy=None,
                    use_action_masking: bool = True,
                    press_is_maskable: bool = True):
    sp, sa = (None, None) if sort_policy is None else (sort_policy[1], sort_policy[0])
    pp, pa = (None, None) if press_policy is None else (press_policy[1], press_policy[0])
    return _step_mono_model_impl(cfg, st, sp, sa, pp, pa,
                                 use_action_masking, press_is_maskable)


@partial(jax.jit, static_argnums=(0, 3))
def step_mono_legacy_random(cfg: SimConfig, st: EnvState, lr,
                            use_action_masking: bool = True):
    """Path 3 (env_monolith.py:152-164): fully random actions from the
    *legacy global* NumPy MT19937 stream (``np.random.choice`` /
    ``np.random.randint``), seeded by set_seed (env_super.py:177).
    ``lr`` is a ``legacy_random.MTState``; returns (state, lr, out)."""
    from . import legacy_random as LR

    st = _common_prelude(cfg, st)
    if use_action_masking:
        mask = D.monolith_action_masks(cfg, st)
        n_valid = mask.sum().astype(I32)
        k, lr = LR.legacy_randint(lr, n_valid)
        csum = jnp.cumsum(mask.astype(I32))
        a = jnp.argmax(csum == (k + 1)).astype(I32)
        sort_mode = a // 11
        press_disc = a % 11
        press_id, mat = D.press_discrete_to_action(press_disc)
        skip = jnp.zeros((), bool)
        inv_code = jnp.zeros((), I32)
    else:
        a, lr = LR.legacy_randint(lr, 22)
        sort_mode = a // 11
        press_disc = a % 11
        # mode='random' without masking sanitizes and *skips* the press
        # dispatch entirely on invalid (env_monolith.py:246-255)
        press_id, mat, skip, inv_code = D.sanitize_press_action(
            cfg, st, press_disc)
    st, out = _mono_apply(cfg, st, sort_mode, press_id, mat, skip, a)
    out = out._replace(press_log=jnp.where(skip, inv_code, out.press_log))
    return st, lr, out


@partial(jax.jit, static_argnums=(0, 3, 4))
def step_mono_policy(cfg: SimConfig, st: EnvState, params, apply_fn,
                     use_action_masking: bool = True):
    """The benchmark's monolith scenario (testing.py:37-44 +
    env_monolith.py path 1): the model predicts deterministically on the
    *previous step's* observation (and mask, iff masking is on), and the
    chosen flat action goes through the external step path (sanitize +
    timer-freeze quirk when unmasked)."""
    obs = D.get_mono_obs(cfg, st)          # pre-step = last step's obs
    if use_action_masking:
        mask = D.monolith_action_masks(cfg, st)
        flat = _masked_mlp_predict(lambda o: apply_fn(params, o), obs, mask)
    else:
        flat = _mlp_predict(lambda o: apply_fn(params, o), obs)
    return step_mono_external(cfg, st, flat, use_action_masking)


@partial(jax.jit, static_argnums=(0, 3, 4))
def step_mono_agent(cfg: SimConfig, st: EnvState, params, apply_fn,
                    use_action_masking: bool = True):
    """Path 2 (env_monolith.py:144-150): internally stored monolith agent,
    deterministic masked predict on the combined obs (the reference always
    passes the mask on this path regardless of the masking flag)."""
    st = _common_prelude(cfg, st)
    obs = D.get_mono_obs(cfg, st)
    mask = D.monolith_action_masks(cfg, st)
    flat = _masked_mlp_predict(lambda o: apply_fn(params, o), obs, mask)
    sort_mode = flat // 11
    press_disc = flat % 11
    press_id, mat = D.press_discrete_to_action(press_disc)
    return _mono_apply(cfg, st, sort_mode, press_id, mat,
                       jnp.zeros((), bool), flat)
