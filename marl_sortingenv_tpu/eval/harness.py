"""Evaluation harness: episode runner + 5-policy benchmark.

Equivalents of reference ``src/testing.py`` (``test_env``) and
``utils/benchmark_models.py`` (``run_model_benchmark`` /
``benchmark_seed_all``), running on the bit-exact parity engine so that
cumulative rewards are directly comparable to the published reference
numbers (BASELINE.md).

The five scenarios per seed (benchmark_models.py:126-183):
  Random / Rule-Based / PPO Sort-Only / PPO Modular / PPO Monolith
all on ``Env_3_Monolith`` reset with the same seed.  Note the reference's
"Random" scenario uses the legacy global NumPy MT19937 stream
(env_monolith.py:158,162) — covered by core.legacy_random; "Sort-Only"
falls back to random *masked* pressing via rng_pressing
(env_monolith.py:213-219), which is bit-exact here.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config.config import SimConfig
from ..core import dynamics as D
from ..core import state as S
from ..core import step as ST
from ..models import mlp


@dataclasses.dataclass
class EpisodeResult:
    cumulative_reward: float
    action_sequence: np.ndarray
    rewards: np.ndarray           # [T] total per step
    reward_pairs: np.ndarray      # [T, 2] (sort, press)
    purities: np.ndarray          # [T]
    final_state: object           # EnvState (unbatched)
    series: Optional[dict] = None  # dashboard series (collect_series=True)


def _scan_episode(cfg, step_thunk, st, steps, collect_series=False):
    def body(st, _):
        st, out = step_thunk(st)
        if collect_series:
            extra = {
                "setting": st.sensor_setting,
                "belt_occupancy": st.belt_occupancy,
                "belt_counts": st.belt_counts,
                "cont_true": st.cont_true,
                "cont_false": st.cont_false,
                "press_timer": st.press_timer,
            }
            return st, (out, extra)
        return st, out

    st, outs = jax.jit(lambda st: lax.scan(body, st, None, length=steps))(st)
    return st, outs


def episode_series(cfg, outs_and_extra):
    """Build the dashboard series dict from a collect_series scan."""
    outs, extra = outs_and_extra
    return {
        "sort_reward": np.asarray(outs.sort_reward),
        "press_reward": np.asarray(outs.press_reward),
        "purity": np.asarray(outs.purity),
        "press_log": np.asarray(outs.press_log),
        "setting": np.asarray(extra["setting"]),
        "belt_occupancy": np.asarray(extra["belt_occupancy"]),
        "belt_counts": np.asarray(extra["belt_counts"]),
        "cont_true": np.asarray(extra["cont_true"]),
        "cont_false": np.asarray(extra["cont_false"]),
        "press_timer": np.asarray(extra["press_timer"]),
    }


def run_episode(cfg: SimConfig, seed: int, steps: int, mode: str = "rule_based",
                sort_params: Optional[mlp.ACParams] = None,
                press_params: Optional[mlp.ACParams] = None,
                mono_params: Optional[mlp.ACParams] = None,
                use_action_masking: bool = True,
                collect_series: bool = False,
                render: bool = False, render_kwargs: Optional[dict] = None
                ) -> EpisodeResult:
    """``test_env`` equivalent on a Monolith env (testing.py:12-85).

    mode: 'rule_based' | 'model' (modular agents with random fallbacks) |
    'mono' (monolith agent) | 'random' (legacy global MT19937 stream).
    """
    st = S.reset(cfg, seed)

    if mode == "rule_based":
        thunk = lambda st: ST.step_mono_rule(cfg, st)
    elif mode == "model":
        sp = None if sort_params is None else (mlp.policy_logits, sort_params)
        pp = None if press_params is None else (mlp.policy_logits, press_params)
        thunk = lambda st: ST.step_mono_model(
            cfg, st, sp, pp, use_action_masking, True)
    elif mode == "mono":
        # the benchmark passes the model to test_env, which predicts on the
        # previous obs (masked iff masking on) and steps the external path
        thunk = lambda st: ST.step_mono_policy(
            cfg, st, mono_params, mlp.policy_logits, use_action_masking)
    elif mode == "random":
        from ..core import legacy_random as LR

        lr = LR.mt19937_init(seed)
        stp = (st, lr)

        def thunk_pair(pair):
            st, lr = pair
            st, lr, out = ST.step_mono_legacy_random(
                cfg, st, lr, use_action_masking)
            return (st, lr), out

        (st, lr), outs = jax.jit(
            lambda p: lax.scan(lambda c, _: thunk_pair(c), p, None,
                               length=steps))(stp)
        return _pack(st, outs)
    else:
        raise ValueError(mode)

    st, scanned = _scan_episode(cfg, thunk, st, steps,
                                collect_series=collect_series or render)
    if collect_series or render:
        outs, extra = scanned
        res = _pack(st, outs)
        res.series = episode_series(cfg, scanned)
        if render:
            from ..viz.dashboard import plot_env

            plot_env(cfg, res.series, st, seed=seed,
                     **(render_kwargs or {"save": True}))
        return res
    return _pack(st, scanned)


def _pack(st, outs) -> EpisodeResult:
    rewards = np.asarray(outs.reward)
    return EpisodeResult(
        cumulative_reward=float(rewards.sum()),
        action_sequence=np.asarray(outs.action),
        rewards=rewards,
        reward_pairs=np.stack(
            [np.asarray(outs.sort_reward), np.asarray(outs.press_reward)], 1),
        purities=np.asarray(outs.purity),
        final_state=st,
    )


POLICY_KEYS = ["Random", "Rule-Based", "PPO Sort-Only", "PPO Modular",
               "PPO Monolith"]


def benchmark_seed_all(cfg: SimConfig, seed: int, steps: int,
                       sort_params=None, press_params=None, mono_params=None,
                       use_action_masking: bool = True,
                       include_random: bool = True) -> Dict[str, float]:
    """All five scenarios for one seed (benchmark_models.py:126-183)."""
    res: Dict[str, float] = {"seed": seed}
    if include_random:
        res["Random"] = run_episode(
            cfg, seed, steps, "random",
            use_action_masking=use_action_masking).cumulative_reward
    res["Rule-Based"] = run_episode(
        cfg, seed, steps, "rule_based").cumulative_reward
    res["PPO Sort-Only"] = run_episode(
        cfg, seed, steps, "model", sort_params=sort_params,
        use_action_masking=use_action_masking).cumulative_reward
    res["PPO Modular"] = run_episode(
        cfg, seed, steps, "model", sort_params=sort_params,
        press_params=press_params,
        use_action_masking=use_action_masking).cumulative_reward
    if mono_params is not None:
        res["PPO Monolith"] = run_episode(
            cfg, seed, steps, "mono", mono_params=mono_params,
            use_action_masking=use_action_masking).cumulative_reward
    return res


def run_engine_benchmark(cfg: SimConfig, engine: str = "fastb",
                         num_episodes: int = 10, steps: int = 200,
                         sort_params=None, press_params=None,
                         mono_params=None, use_action_masking: bool = True,
                         include_random: bool = True, seed0: int = 1):
    """The 5-policy protocol on a fast engine (``fast`` or ``fastb``) —
    a distribution-level cross-check of engine drift against the
    bit-exact parity numbers from :func:`run_model_benchmark`.

    The fast engines use threefry streams, so per-seed values are not
    comparable to the reference seed-for-seed; the mean/std over
    ``num_episodes`` lockstep instances is.  Returns the same
    ``{policy: {mean, std}}`` summary shape."""
    from ..core import fast as FE
    from ..core import fastb as FB

    mod = {"fast": FE, "fastb": FB}[engine]
    sp = None if sort_params is None else (mlp.policy_logits, sort_params)
    pp = None if press_params is None else (mlp.policy_logits, press_params)

    def batched(fn):
        if engine == "fastb":
            return fn
        return jax.vmap(fn)

    def episode_totals(step_batch, with_obs_policy=None):
        st = mod.reset_batch(cfg, jax.random.PRNGKey(seed0), num_episodes)

        if with_obs_policy is None:
            def body(st, _):
                st, out = step_batch(st)
                return st, out.reward
            _, rewards = jax.jit(
                lambda st: lax.scan(body, st, None, length=steps))(st)
        else:
            obs0 = batched(lambda s: mod.get_mono_obs(cfg, s))(st) \
                if engine == "fast" else mod.get_mono_obs(cfg, st)

            def body(carry, _):
                st, obs = carry
                logits = mlp.policy_logits(with_obs_policy, obs)
                if use_action_masking:
                    mask = (batched(
                        lambda s: mod.monolith_action_masks(cfg, s))(st)
                        if engine == "fast"
                        else mod.monolith_action_masks(cfg, st))
                    logits = mlp.masked_logits(logits, mask)
                a = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                st, out = step_batch(st, a)
                return (st, out.obs), out.reward
            (_, _), rewards = jax.jit(
                lambda c: lax.scan(body, c, None, length=steps))((st, obs0))
        return np.asarray(rewards, np.float64).sum(axis=0)

    summary = {}

    def put(key, totals):
        summary[key] = {"mean": float(totals.mean()),
                        "std": float(totals.std())}

    if include_random:
        put("Random", episode_totals(batched(
            lambda s: mod.step_mono_random(cfg, s, use_action_masking))))
    put("Rule-Based", episode_totals(batched(
        lambda s: mod.step_mono_rule(cfg, s))))
    put("PPO Sort-Only", episode_totals(batched(
        lambda s: mod.step_mono_model(cfg, s, sp, None,
                                      use_action_masking))))
    put("PPO Modular", episode_totals(batched(
        lambda s: mod.step_mono_model(cfg, s, sp, pp, use_action_masking))))
    if mono_params is not None:
        put("PPO Monolith", episode_totals(
            batched(lambda s, a: mod.step_mono_external(
                cfg, s, a, use_action_masking)),
            with_obs_policy=mono_params))
    return summary


def compare_engine_drift(cfg: SimConfig, num_seeds: int = 10,
                         steps: int = 200, sort_params=None,
                         press_params=None, mono_params=None,
                         use_action_masking: bool = True,
                         engines=("fast", "fastb")):
    """One table: parity-engine benchmark (bit-exact protocol) vs each
    fast engine's distribution — the VERDICT round-2 cross-engine check.
    Returns {engine: {policy: {mean, std}}} with 'parity' included."""
    parity, _ = run_model_benchmark(
        cfg, num_seeds=num_seeds, steps=steps, sort_params=sort_params,
        press_params=press_params, mono_params=mono_params,
        use_action_masking=use_action_masking)
    table = {"parity": parity}
    for eng in engines:
        table[eng] = run_engine_benchmark(
            cfg, engine=eng, num_episodes=num_seeds, steps=steps,
            sort_params=sort_params, press_params=press_params,
            mono_params=mono_params,
            use_action_masking=use_action_masking)
    return table


def run_model_benchmark(cfg: SimConfig, num_seeds: int = 10, steps: int = 200,
                        sort_params=None, press_params=None, mono_params=None,
                        use_action_masking: bool = True,
                        include_random: bool = True,
                        print_table: bool = False):
    """Mean/std per policy over seeds 1..num_seeds
    (benchmark_models.py:19-119).  Returns {policy: {mean, std}}.
    ``print_table`` prints the per-seed lines and the pandas summary the
    reference prints (benchmark_models.py:26-47, 176-181)."""
    rows: List[Dict[str, float]] = []
    if print_table:
        header = "Seed\t    Random\tRule-Based\t Sort-Only\t   Modular\t  Monolith"
        print(f"\n⚙ Running benchmark sequentially across {num_seeds} seeds...\n")
        print(header)
        print("-" * (len(header) + 20))
    for seed in range(1, num_seeds + 1):
        row = benchmark_seed_all(
            cfg, seed, steps, sort_params, press_params, mono_params,
            use_action_masking, include_random)
        rows.append(row)
        if print_table:
            line = f"  {seed: >4}"
            for key in POLICY_KEYS:
                val = row.get(key)
                line += f"\t{val: >10.2f}" if val is not None else "\t       N/A"
            print(line)
    summary = {}
    for key in POLICY_KEYS:
        vals = [r[key] for r in rows if key in r]
        if vals:
            summary[key] = {
                "mean": float(np.mean(vals)), "std": float(np.std(vals))
            }
    if print_table and summary:
        try:
            import pandas as pd

            df = pd.DataFrame(summary).T
            df.index.name = "Policy"
            print("\n" + "=" * 80)
            print("Summary of Benchmark Results:")
            print(df.to_string(float_format="%.2f"))
            print("=" * 80)
        except ImportError:
            pass
    return summary, rows
