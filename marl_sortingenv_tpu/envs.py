"""Gymnasium-compatible drop-in environments.

A user of the reference (``src/envs_train/env_1_sort.py`` /
``env_2_press.py`` / ``env_monolith.py``) finds the same classes, the
same constructor signature, the same ``reset/step/action_masks/
set_agents/render`` API and the same ``reward_data`` logging dict —
backed by the bit-exact device engine instead of Python loops.

These host wrappers are for interactive/Gym-ecosystem use (SB3-style
training loops, env checkers); production training uses the fully
on-device vectorized path (``learn``/``core.wrappers``) instead.

Agents passed to ``set_agents`` may be:
* ``models.mlp.ACParams`` pytrees (fused into the jitted step),
* SB3 policy objects or state_dicts (converted via
  ``mlp.from_torch_state_dict``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .config.config import SimConfig, load_config
from .core import dynamics as D
from .core import legacy_random as LR
from .core import state as S
from .core import step as ST
from .models import mlp

try:
    import gymnasium as gym
    from gymnasium import spaces

    _GYM = True
except ImportError:  # gate: minimal shim
    _GYM = False

    class _Space:
        def __init__(self, n=None, shape=None):
            self.n = n
            self.shape = shape

        def seed(self, s):
            pass

    class spaces:  # type: ignore
        @staticmethod
        def Discrete(n):
            return _Space(n=n)

        @staticmethod
        def Box(low, high, dtype=None):
            return _Space(shape=np.shape(low))

    class gym:  # type: ignore
        class Env:
            pass


def _coerce_params(agent) -> Optional[mlp.ACParams]:
    if agent is None:
        return None
    if isinstance(agent, mlp.ACParams):
        return agent
    if hasattr(agent, "policy"):  # SB3 model
        return mlp.from_torch_state_dict(
            {k: v.detach().cpu().numpy()
             for k, v in agent.policy.state_dict().items()})
    if isinstance(agent, dict):  # raw state_dict
        return mlp.from_torch_state_dict(agent)
    raise TypeError(f"unsupported agent type: {type(agent)}")


class _EnvBase(gym.Env):
    """Shared host wrapper around the parity engine."""

    name = "base"

    def __init__(self, max_steps: int = 50, seed: Optional[int] = None,
                 noise_sorting: Optional[float] = 0.05,
                 balesize: Optional[int] = 200, simulation: bool = False,
                 config_path: Optional[str] = None):
        self.config = load_config(
            config_path,
            max_steps=max_steps,
            noise_sorting=noise_sorting,
            balesize=balesize,
        )
        self.max_steps = max_steps
        self.seed_value = seed if seed is not None else 0
        self._initialize_spaces()
        if hasattr(self.action_space, "seed"):
            self.action_space.seed(self.seed_value)
            self.observation_space.seed(self.seed_value)
        self.state = S.reset(self.config, self.seed_value)
        self._reset_logs()

    # -- reference API ----------------------------------------------------
    def reset(self, seed=None, options=None):
        if seed is not None:
            self.seed_value = seed
            self.state = S.reset(self.config, seed)
        else:
            # reference reset(seed=None) keeps the live RNG streams and
            # re-seeds only the input generator (env_super.py:375-378);
            # autoreset resets plant state on the *current* streams, so
            # consecutive unseeded episodes differ (deterministically —
            # see core/wrappers docstring) while reset(seed=k) replays.
            from .core.wrappers import autoreset

            self.state = autoreset(self.config, self.state)
        self._reset_logs()
        return np.asarray(self.get_obs()), {}

    def _step_with_overflow(self, step_fn, action):
        """``step(check_overflow=True)`` path, routed through
        ``core.wrappers.with_overflow_termination`` (reference
        env_1_sort.py:133-142, env_2_press.py:145-153,
        env_monolith.py:265-272): overflow after the step terminates the
        episode with ``overflow_termination_penalty`` and overflow info."""
        from .core import wrappers as W

        stepped = W.with_overflow_termination(self.config, step_fn, self.name)
        self.state, out = stepped(self.state, action)
        extra = {}
        if bool(np.asarray(out.terminated)):
            over, mat = self.detect_overflow()
            if over:
                extra = {"overflow": True, "overflow_material": mat}
        return out, extra

    def _reset_logs(self):
        self.reward_data = {
            "Accuracy": [], "Setting": [], "Belt_Occupancy": [],
            "Reward": [], "Total": [], "Belt_Proportions": [],
        }
        for m in "ABCDE":
            self.reward_data[f"{m}_True"] = []
            self.reward_data[f"{m}_False"] = []
        self.press_actions_per_timestep = []
        # dashboard-only per-step series (not part of the reference's
        # reward_data keys): raw belt counts and press timers, so render()
        # feeds real data to panels 7/9 (plotting.py:28-692) instead of
        # placeholders — matches eval/harness.episode_series
        self._belt_counts_log = []
        self._press_timer_log = []

    def _log(self, out):
        st = self.state
        r_sort = float(out.sort_reward)
        r_press = float(out.press_reward)
        self.reward_data["Reward"].append((r_sort, r_press))
        self.reward_data["Total"].append(r_sort + r_press)
        self.reward_data["Accuracy"].append(float(out.purity))
        self.reward_data["Setting"].append(int(np.asarray(st.sensor_setting)))
        self.reward_data["Belt_Occupancy"].append(
            float(np.asarray(st.belt_occupancy)))
        belt = np.asarray(st.belt_counts, np.float64)
        tot = belt.sum()
        props = belt / tot if tot > 0 else np.zeros(4)
        self.reward_data["Belt_Proportions"].append(
            dict(zip("ABCD", props.tolist())))
        ct = np.asarray(st.cont_true)
        cf = np.asarray(st.cont_false)
        for i, m in enumerate("ABCD"):
            self.reward_data[f"{m}_True"].append(int(ct[i]))
            self.reward_data[f"{m}_False"].append(int(cf[i]))
        self.reward_data["E_True"].append(int(ct[4]))
        self.reward_data["E_False"].append(0)
        self.press_actions_per_timestep.append(int(out.press_log))
        self._belt_counts_log.append(belt.astype(np.int64))
        self._press_timer_log.append(
            np.asarray(st.press_timer, np.int64).copy())

    @property
    def container_materials(self):
        ct = np.asarray(self.state.cont_true)
        cf = np.asarray(self.state.cont_false)
        d = {m: int(ct[i]) for i, m in enumerate("ABCD")}
        d.update({f"{m}_False": int(cf[i]) for i, m in enumerate("ABCD")})
        d["E"] = int(ct[4])
        return d

    @property
    def press_state(self):
        st = self.state
        t = np.asarray(st.press_timer)
        m = np.asarray(st.press_mat)
        n = np.asarray(st.press_n)
        q = np.asarray(st.press_q)
        mats = "ABCDE"
        return {
            "press_1": int(t[0]), "material_1": mats[int(m[0])] if n[0] else 0,
            "n_1": int(n[0]), "q_1": float(q[0]),
            "press_2": int(t[1]), "material_2": mats[int(m[1])] if n[1] else 0,
            "n_2": int(n[1]), "q_2": float(q[1]),
        }

    @property
    def bale_count(self):
        st = self.state
        cnt = np.asarray(st.bale_cnt)
        sizes = np.asarray(st.bale_size)
        quals = np.asarray(st.bale_qual)
        return {
            m: [(int(sizes[i, b]), int(quals[i, b]))
                for b in range(int(cnt[i]))]
            for i, m in enumerate("ABCDE")
        }

    @property
    def current_step(self):
        return int(np.asarray(self.state.current_step))

    def press_action_masks(self):
        return np.asarray(D.press_action_masks(self.config, self.state))

    def monolith_action_masks(self):
        return np.asarray(D.monolith_action_masks(self.config, self.state))

    def detect_overflow(self):
        over = bool(np.asarray(D.detect_overflow(self.config, self.state)))
        if not over:
            return False, None
        levels = np.concatenate([
            np.asarray(self.state.cont_true)[:4]
            + np.asarray(self.state.cont_false),
            np.asarray(self.state.cont_true)[4:5],
        ])
        mat = "ABCDE"[int(np.argmax(levels > self.config.container_capacity))]
        return True, mat

    def render(self, mode="human", save=False, show=False,
               log_dir="./img/log", filename="plot", title="",
               format="svg", checksum=True, steps_test=None):
        from .viz.dashboard import plot_env

        rd = self.reward_data
        T = len(rd["Total"])
        series = {
            "sort_reward": np.array([r[0] for r in rd["Reward"]]),
            "press_reward": np.array([r[1] for r in rd["Reward"]]),
            "purity": np.array(rd["Accuracy"]),
            "press_log": np.array(self.press_actions_per_timestep),
            "setting": np.array(rd["Setting"]),
            "belt_occupancy": np.array(rd["Belt_Occupancy"]),
            "belt_counts": (np.stack(self._belt_counts_log)
                            if self._belt_counts_log else np.zeros((0, 4))),
            "cont_true": np.column_stack(
                [rd[f"{m}_True"] for m in "ABCDE"]) if T else np.zeros((0, 5)),
            "cont_false": np.column_stack(
                [rd[f"{m}_False"] for m in "ABCD"]) if T else np.zeros((0, 4)),
            "press_timer": (np.stack(self._press_timer_log)
                            if self._press_timer_log else np.zeros((0, 2))),
        }
        plot_env(self.config, series, self.state, save=save, show=show,
                 log_dir=log_dir, filename=filename, title=title, fmt=format,
                 checksum=checksum, seed=self.seed_value)

    def _finish_step(self, out, extra_info=None):
        self._log(out)
        obs = np.asarray(out.obs)
        info = {"action": int(out.action)}
        if extra_info:
            info.update(extra_info)
        return (obs, float(out.reward), bool(out.terminated), False, info)


class Env_1_Sorting(_EnvBase):
    """Reference env_1_sort.py: Discrete(2) sort mode; random masked
    pressing side."""

    name = "sort"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.press_agent = None

    def _initialize_spaces(self):
        low = np.concatenate([np.zeros(9), np.full(4, -1.0)]).astype(np.float32)
        high = np.ones(13, np.float32)
        self.observation_space = spaces.Box(low, high, dtype=np.float32)
        self.action_space = spaces.Discrete(2)

    def set_agents(self, press_agent=None):
        self.press_agent = _coerce_params(press_agent)

    def action_masks(self):
        return np.array([True, True])

    def get_obs(self):
        return np.asarray(D.get_sort_obs(self.config, self.state))

    def step(self, action=None, use_action_masking=True,
             check_overflow=False):
        act = jnp.int32(int(action))
        if check_overflow:
            out, extra = self._step_with_overflow(ST.step_sort, act)
            return self._finish_step(out, extra)
        self.state, out = ST.step_sort(self.config, self.state, act)
        return self._finish_step(out)


class Env_2_Pressing(_EnvBase):
    """Reference env_2_press.py: Discrete(11) press actions; sort side by
    frozen agent (hierarchical) or rule."""

    name = "press"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.sort_agent = None

    def _initialize_spaces(self):
        self.observation_space = spaces.Box(
            np.zeros(16, np.float32), np.ones(16, np.float32),
            dtype=np.float32)
        self.action_space = spaces.Discrete(11)

    def set_agents(self, sort_agent=None):
        self.sort_agent = _coerce_params(sort_agent)

    def action_masks(self):
        return self.press_action_masks()

    def get_obs(self):
        return np.asarray(D.get_press_obs(self.config, self.state))

    def step(self, action, use_action_masking=True, check_overflow=False):
        sp = None if self.sort_agent is None else (
            mlp.policy_logits, self.sort_agent)
        act = jnp.int32(int(action))

        def fn(c, s, a):
            return ST.step_press(c, s, a, sp, use_action_masking)

        if check_overflow:
            out, extra = self._step_with_overflow(fn, act)
            return self._finish_step(out, extra)
        self.state, out = fn(self.config, self.state, act)
        return self._finish_step(out)


class Env_3_Monolith(_EnvBase):
    """Reference env_monolith.py: Discrete(22) joint space; five action
    sources (external / internal mono agent / random / rule_based /
    modular model)."""

    name = "mono"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.sort_agent = None
        self.press_agent = None
        self.mono_agent = None
        self._legacy = LR.mt19937_init(self.seed_value)

    def _initialize_spaces(self):
        low = np.concatenate(
            [np.zeros(9), np.full(4, -1.0), np.zeros(16)]).astype(np.float32)
        high = np.ones(29, np.float32)
        self.observation_space = spaces.Box(low, high, dtype=np.float32)
        self.action_space = spaces.Discrete(22)

    def reset(self, seed=None, options=None):
        obs, info = super().reset(seed=seed, options=options)
        if seed is not None:
            self._legacy = LR.mt19937_init(seed)
        return obs, info

    def set_agents(self, sort_agent=None, press_agent=None, mono_agent=None):
        self.sort_agent = _coerce_params(sort_agent)
        self.press_agent = _coerce_params(press_agent)
        self.mono_agent = _coerce_params(mono_agent)

    def action_masks(self):
        return self.monolith_action_masks()

    def get_obs(self):
        return np.asarray(D.get_mono_obs(self.config, self.state))

    def step(self, action=None, mode=None, use_action_masking=True,
             check_overflow=False):
        cfg = self.config
        act = jnp.int32(int(action) if action is not None else 0)
        if action is not None:
            def fn(c, s, a):
                return ST.step_mono_external(c, s, a, use_action_masking)
        elif self.mono_agent is not None:
            def fn(c, s, a):
                return ST.step_mono_agent(
                    c, s, self.mono_agent, mlp.policy_logits,
                    use_action_masking)
        elif mode == "random":
            def fn(c, s, a):
                s, self._legacy, out = ST.step_mono_legacy_random(
                    c, s, self._legacy, use_action_masking)
                return s, out
        elif mode == "rule_based":
            def fn(c, s, a):
                return ST.step_mono_rule(c, s)
        elif mode == "model":
            sp = None if self.sort_agent is None else (
                mlp.policy_logits, self.sort_agent)
            pp = None if self.press_agent is None else (
                mlp.policy_logits, self.press_agent)

            def fn(c, s, a):
                return ST.step_mono_model(c, s, sp, pp,
                                          use_action_masking, True)
        else:
            raise ValueError(
                "Invalid action source: Provide 'action', set 'mode' to "
                "'random', 'rule_based', or 'model', or assign a mono_agent.")
        if check_overflow:
            out, extra = self._step_with_overflow(fn, act)
            return self._finish_step(out, extra)
        self.state, out = fn(cfg, self.state, act)
        return self._finish_step(out)
