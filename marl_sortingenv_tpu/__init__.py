"""marl_sortingenv_tpu — a TPU-native framework with the capabilities of
Storm-131/MARL-SortingEnv (reference mounted at /root/reference).

The reference (a pure-Python Gymnasium benchmark for sequential industrial
control: recycling plant with input generator -> sorting machine -> containers
-> two presses) is re-designed TPU-first:

* the ``step()`` loop is a pure-functional JAX state machine under
  ``jit`` + ``vmap`` across thousands of instances (``core/``),
* the five NumPy PCG64 RNG streams of the reference
  (reference ``src/envs_train/env_super.py:165-184``) are reproduced
  **bit-exactly** on device (``core/rng.py``) so trajectories, rewards and
  masks match the reference per step under a fixed seed,
* action masking is a batched pure function fused into the jitted step,
* the hierarchical mode (pressing env invoking a frozen sorting policy,
  reference ``env_2_press.py:106-109``) is an on-device MLP forward inside
  the jitted step (``models/``),
* training is an on-device Maskable-PPO learner (``learn/``), sharded over a
  ``jax.sharding.Mesh`` with XLA collectives (``parallel/``).

Subpackage map (component parity vs reference documented per module):
  config/    frozen config pytree       <-> reference config.yml
  core/      env state machine + RNG    <-> src/envs_train/env_super.py,
                                             utils/input_generator.py,
                                             env_1_sort / env_2_press / env_monolith
  models/    policies (MLP + rules)     <-> SB3 MlpPolicy 32x32, rule-based fns
  learn/     Maskable PPO               <-> SB3 PPO / sb3-contrib MaskablePPO
  parallel/  mesh + sharded train step  (new: reference is single-process CPU)
  eval/      episode runner + benchmark <-> src/testing.py, utils/benchmark_models.py
  viz/       dashboard + checksum       <-> utils/plotting.py
  utils/     checkpointing, metrics     <-> src/training.py save/rotate helpers
"""

__version__ = "0.1.0"
