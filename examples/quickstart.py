import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Quickstart: the three ways to use the framework.

Run:  python examples/quickstart.py          (CPU-friendly, ~2 min)
"""

import jax

# Tests and interactive use on this machine prefer local CPU; on a real
# TPU deployment drop this line.
jax.config.update("jax_platforms", "cpu")

import numpy as np


def demo_gym_api():
    """1. Drop-in Gymnasium API (same classes as the reference)."""
    from marl_sortingenv_tpu.envs import Env_3_Monolith
    from marl_sortingenv_tpu.utils.env_checker import check_env

    env = Env_3_Monolith(max_steps=50, seed=42, noise_sorting=0.0)
    check_env(env)
    env.reset(seed=42)
    total = 0.0
    for _ in range(50):
        obs, r, done, _, info = env.step(action=None, mode="rule_based")
        total += r
    print(f"[gym api] rule-based 50-step return: {total:.2f}")
    print(f"[gym api] containers: {env.container_materials}")


def demo_vectorized_engine():
    """2. Vectorized on-device engine: 1024 lockstep envs, one jitted scan."""
    import jax.numpy as jnp
    from jax import lax

    from marl_sortingenv_tpu.config.config import load_config
    from marl_sortingenv_tpu.core import fast as FE

    cfg = load_config(max_steps=200, noise_sorting=0.0)
    n = 1024
    st = FE.reset_batch(cfg, jax.random.PRNGKey(0), n)

    def body(st, _):
        st, out = jax.vmap(lambda s: FE.step_mono_rule(cfg, s))(st)
        return st, out.reward

    st, rewards = jax.jit(
        lambda st: lax.scan(body, st, None, length=200))(st)
    cum = np.asarray(rewards).sum(0)
    print(f"[vectorized] {n} envs x 200 steps; mean cumulative reward "
          f"{cum.mean():.2f} ± {cum.std():.2f}")


def demo_training():
    """3. On-device Maskable-PPO (tiny budget for the demo)."""
    from marl_sortingenv_tpu.config.config import load_config
    from marl_sortingenv_tpu.learn import ppo, trainer

    cfg = load_config(max_steps=50, noise_sorting=0.0)
    res = trainer.train_agent(
        cfg, "sort", total_timesteps=4096, n_envs=8, use_action_masking=True,
        engine="fast", eval_freq=2048, eval_envs=4,
        pcfg=ppo.PPOConfig(n_steps=64, batch_size=64, n_epochs=2),
        verbose=True)
    print(f"[training] sort agent eval after 4k steps: "
          f"{res.final_eval_mean:.2f}")


if __name__ == "__main__":
    demo_gym_api()
    demo_vectorized_engine()
    demo_training()
