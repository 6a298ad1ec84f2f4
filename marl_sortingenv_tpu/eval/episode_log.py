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


def first_inputs(cfg, seed, k: int = 10) -> List[str]:
    """Replay the seasonal input generator's FIRST batch on the host and
    return its first ``k`` unit symbols — the reference's "First 10
    elements" checksum line (``utils/plotting.py:676-678``, fed by
    ``env_super.py:446`` ``input_history_batches``).

    The device engines carry material *counts*; the per-unit symbol
    order only exists inside the generator's shuffle
    (``utils/input_generator.py:49-62``).  That generator draws from a
    plain ``np.random.default_rng(seed)`` stream (permutation of the 2
    pattern keys, one ``choice`` per remainder unit, one ``shuffle`` of
    the batch), so an exact host replay of the first batch is three
    numpy calls — no engine state needed, bit-exact by construction."""
    names = ["A", "B", "C", "D"]
    patterns = {1: [0.40, 0.15, 0.35, 0.10],   # A & C dominant
                2: [0.15, 0.40, 0.10, 0.35]}   # B & D dominant
    rng = np.random.default_rng(seed)
    seq = rng.permutation(list(patterns.keys()))
    ratios = patterns[int(seq[0])]
    bs = cfg.input_batch_size
    units = {m: int(np.floor(r * bs)) for m, r in zip(names, ratios)}
    for _ in range(bs - sum(units.values())):
        units[str(rng.choice(names))] += 1
    batch: List[str] = []
    for m in names:
        batch.extend([m] * units[m])
    rng.shuffle(batch)
    return batch[:k]


def print_checksum(state, seed=None, cfg=None) -> None:
    c = checksum(state)
    print(
        f"🔍 Checksum (Seed={seed}): {c['checksum']} = "
        f"({c['containers']} Containers + {c['presses']} Presses + "
        f"{c['bales']} Bales)"
    )
    print("🔍 Length of Inputs: ", c["input_length"])
    if cfg is not None and seed is not None:
        print(f"First 10 elements: {first_inputs(cfg, seed)}")
