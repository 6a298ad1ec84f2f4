"""Host-side ``reward_data`` equivalent (reference
``env_super.py:928-946`` ``_log_step_data`` + plotting inputs).

The device engine returns stacked ``StepOut`` arrays from a scanned
episode; this module reshapes them into the dict-of-series structure the
reference accumulates per step, and computes the console *checksum*
fingerprint the reference prints from ``plot_env``
(``utils/plotting.py:663-678``): total material in containers + presses +
bales, plus the input count.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np


@dataclasses.dataclass
class EpisodeLog:
    reward_data: Dict[str, np.ndarray]
    final_state: object

    @property
    def cumulative_total(self) -> float:
        return float(np.sum(self.reward_data["Total"]))


def build_episode_log(cfg, outs, final_state, belt_props=None) -> EpisodeLog:
    """``outs``: stacked StepOut over time [T, ...] (unbatched instance).
    ``final_state``: EnvState/FastEnvState after the episode."""
    sort_r = np.asarray(outs.sort_reward)
    press_r = np.asarray(outs.press_reward)
    rd = {
        "Reward": np.stack([sort_r, press_r], axis=1),
        "Total": sort_r + press_r,
        "Accuracy": np.asarray(outs.purity),
        "Action": np.asarray(outs.action),
        "PressLog": np.asarray(getattr(outs, "press_log", np.zeros_like(sort_r))),
    }
    return EpisodeLog(reward_data=rd, final_state=final_state)


def checksum(state) -> Dict[str, int]:
    """Reference checksum (plotting.py:663-678): material in containers +
    presses + bales; input length from the conservation counter."""
    in_containers = int(np.asarray(state.cont_true).sum()
                        + np.asarray(state.cont_false).sum())
    in_presses = int(np.asarray(state.press_n).sum())
    in_bales = int(np.asarray(state.bale_size).sum())
    return {
        "checksum": in_containers + in_presses + in_bales,
        "containers": in_containers,
        "presses": in_presses,
        "bales": in_bales,
        "input_length": int(np.asarray(state.total_input_units)),
    }


def print_checksum(state, seed=None) -> None:
    c = checksum(state)
    print(
        f"🔍 Checksum (Seed={seed}): {c['checksum']} = "
        f"({c['containers']} Containers + {c['presses']} Presses + "
        f"{c['bales']} Bales)"
    )
    print("🔍 Length of Inputs: ", c["input_length"])
