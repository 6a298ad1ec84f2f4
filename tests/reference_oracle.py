"""Golden-trajectory oracle: drives the *actual* reference implementation
(mounted read-only at /root/reference) and records a full state snapshot
per step.  Used by the parity tests to validate the TPU engine bit-for-bit.

Nothing from the reference is copied; it is imported and executed as a
black box.  The reference must be run with cwd=/root/reference because it
opens ``config.yml`` relative to the cwd.
"""

import contextlib
import os
import sys

import numpy as np

REFERENCE = "/root/reference"

_MAT_IDX = {"A": 0, "B": 1, "C": 2, "D": 3, "E": 4, 0: 0}


@contextlib.contextmanager
def reference_cwd():
    old = os.getcwd()
    os.chdir(REFERENCE)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    try:
        yield
    finally:
        os.chdir(old)


def make_env(variant: str, max_steps=200, seed=42, noise_sorting=0.0, balesize=200):
    with reference_cwd():
        if variant == "sort":
            from src.envs_train.env_1_sort import Env_1_Sorting as E
        elif variant == "press":
            from src.envs_train.env_2_press import Env_2_Pressing as E
        elif variant == "mono":
            from src.envs_train.env_monolith import Env_3_Monolith as E
        else:
            raise ValueError(variant)
        return E(max_steps=max_steps, seed=seed, noise_sorting=noise_sorting,
                 balesize=balesize)


def snapshot(env):
    """Full state fingerprint after a step (or reset)."""
    cm = env.container_materials
    ps = env.press_state
    snap = {
        "input_counts": np.array(env.current_material_input, np.int32),
        "belt_counts": np.array(env.current_material_belt, np.int32),
        "sort_counts": np.array(env.current_material_sorting, np.int32),
        "acc_belt": np.array(env.accuracy_belt, np.float64),
        "acc_sorter": np.array(env.accuracy_sorter, np.float64),
        "sensor_setting": np.int32(env.sensor_current_setting),
        "input_occupancy": np.float64(env.input_occupancy),
        "belt_occupancy": np.float64(env.belt_occupancy),
        "cont_true": np.array(
            [cm["A"], cm["B"], cm["C"], cm["D"], cm["E"]], np.int32
        ),
        "cont_false": np.array(
            [cm["A_False"], cm["B_False"], cm["C_False"], cm["D_False"]],
            np.int32,
        ),
        "press_timer": np.array([ps["press_1"], ps["press_2"]], np.int32),
        "press_mat": np.array(
            [_MAT_IDX[ps["material_1"]], _MAT_IDX[ps["material_2"]]], np.int32
        ),
        "press_n": np.array([ps["n_1"], ps["n_2"]], np.int32),
        "press_q": np.array([ps["q_1"], ps["q_2"]], np.float64),
        "mask": np.array(env.press_action_masks(), bool),
        "current_step": np.int32(env.current_step),
    }
    for mat, row in zip("ABCDE", range(5)):
        bales = env.bale_count[mat]
        snap[f"bale_sizes_{mat}"] = np.array([b[0] for b in bales], np.int64)
        snap[f"bale_quals_{mat}"] = np.array([b[1] for b in bales], np.int64)
    return snap


def run_episode(variant, seed, steps, actions=None, mode=None,
                use_action_masking=True, max_steps=200, noise_sorting=0.0):
    """Run `steps` steps on the reference env; returns reset obs and a list
    of per-step records {obs, reward, terminated, action, snapshot}."""
    env = make_env(variant, max_steps=max_steps, seed=seed,
                   noise_sorting=noise_sorting)
    with reference_cwd():
        obs0, _ = env.reset(seed=seed)
        records = []
        for t in range(steps):
            if variant == "mono":
                if actions is not None:
                    obs, r, done, _, info = env.step(
                        action=int(actions[t]),
                        use_action_masking=use_action_masking)
                else:
                    obs, r, done, _, info = env.step(
                        action=None, mode=mode,
                        use_action_masking=use_action_masking)
            elif variant == "sort":
                obs, r, done, _, info = env.step(action=int(actions[t]))
            else:  # press
                obs, r, done, _, info = env.step(
                    int(actions[t]), use_action_masking=use_action_masking)
            rec = {
                "obs": np.asarray(obs, np.float32),
                "reward": np.float64(r),
                "terminated": bool(done),
                "action": np.int64(info.get("action", -1)),
                "reward_pair": np.array(env.reward_data["Reward"][-1], np.float64),
                "purity": np.float64(env.reward_data["Accuracy"][-1]),
                "snap": snapshot(env),
            }
            records.append(rec)
        return np.asarray(obs0, np.float32), records
