"""``test_env`` — signature-compatible port of reference
``src/testing.py:12-85``, operating on the host Gymnasium wrappers
(``marl_sortingenv_tpu.envs``).

As in the reference, the ``action=None, mode=...`` calling convention
only works with ``Env_3_Monolith`` (Env_1/Env_2 step signatures take the
action directly)."""

from __future__ import annotations

import numpy as np


def test_env(env=None, tag="", save=False, title="", steps=50, dir="./img/",
             seed=None, show=False, stats=True, mode="model", model=None,
             use_action_masking=True):
    """Run one evaluation episode; returns (cumulative_reward_from_logs,
    action_sequence)."""
    if env is None:
        raise ValueError("Environment must be provided")

    obs, info = env.reset(seed=seed)
    action_sequence = []
    cumulative_reward = 0.0

    for i in range(steps):
        action = None
        if mode == "model" and model is not None:
            from .models import mlp

            params = model if isinstance(model, mlp.ACParams) else None
            if params is not None:
                if use_action_masking and hasattr(env, "action_masks"):
                    a = mlp.predict_deterministic(
                        params, np.asarray(obs), env.action_masks())
                else:
                    a = mlp.predict_deterministic(params, np.asarray(obs))
                action = int(a)
            else:  # object with .predict (SB3-style)
                if use_action_masking and hasattr(env, "action_masks"):
                    action, _ = model.predict(
                        obs, deterministic=True,
                        action_masks=env.action_masks())
                else:
                    action, _ = model.predict(obs, deterministic=True)
                action = int(action)

        obs, reward, done, _, info = env.step(
            action=action, mode=mode, use_action_masking=use_action_masking)
        cumulative_reward += reward
        action_sequence.append(info.get("action", action))

        if done:
            if stats:
                print(f"\n---- Testing Results - {mode} ----")
                print(f"🏁 Epoch ended after {i + 1} steps.")
            env.render(save=save, log_dir=dir,
                       filename=f"{tag}_env_simulation", title=title,
                       show=show, checksum=stats, steps_test=steps)
            total = float(np.sum(env.reward_data["Total"]))
            if stats:
                print(f"👑 Total Reward: {total:.2f}")
            break

    if env.reward_data.get("Total"):
        final_cumulative = float(np.sum(env.reward_data["Total"]))
    else:
        final_cumulative = cumulative_reward
    return final_cumulative, action_sequence
