"""EnvState: the reference environment's mutable state as a fixed-shape
JAX pytree (one instance per leaf-row; batch via ``vmap``).

Field-by-field parity map against reference ``src/envs_train/env_super.py``
(SURVEY.md §2.1):

=====================  ==========================================================
field                  reference counterpart
=====================  ==========================================================
input/belt/sort        ``current_material_input/belt/sorting`` (env_super.py:52-54)
acc_belt/acc_sorter    ``accuracy_belt``/``accuracy_sorter`` (env_super.py:60-61)
sensor_setting         ``sensor_current_setting`` (env_super.py:64)
input/belt_occupancy   env_super.py:67-68 (rounded to 2 decimals)
cont_true/cont_false   ``container_materials`` 9 keys -> 5 true (A..D,E) + 4 false
press_timer/mat/n/q    ``press_state`` dict (env_super.py:79-82)
bale_size/qual/cnt     ``bale_count`` variable-length lists -> fixed ring buffers
last_press_started..   ``_last_press_started``/``_last_press_amount`` (:90-91)
press_penalty_flag     env_super.py:85 (set in use_press, reset only on reset)
gen_*                  ``SeasonalInputGenerator`` pattern machine
                       (utils/input_generator.py:21-34)
current_step           env_super.py:137
total_input_units      len-sum of ``input_history_batches`` (conservation audit)
error_flag             conservation ``ValueError`` sites (env_super.py:582-594)
rng_*                  the five ``np.random.default_rng`` streams
                       (env_super.py:170-174) + the generator's own stream
=====================  ==========================================================

``input_history`` (plot-only deque) and ``reward_data`` (host-side logging)
intentionally live off-device; the eval layer reconstructs them.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .rng import PCG64State, pcg64_init, random_interval32
from ..config.config import SimConfig

I32 = jnp.int32
F64 = jnp.float64


class EnvState(NamedTuple):
    # pipeline stages (counts of A..D)
    input_counts: jax.Array   # i32[4]
    belt_counts: jax.Array    # i32[4]
    sort_counts: jax.Array    # i32[4]
    # sorting machine
    acc_belt: jax.Array       # f64[4]
    acc_sorter: jax.Array     # f64[4]
    sensor_setting: jax.Array  # i32
    input_occupancy: jax.Array  # f64
    belt_occupancy: jax.Array   # f64
    # containers: true A..D + E at [4]; false A..D
    cont_true: jax.Array      # i32[5]
    cont_false: jax.Array     # i32[4]
    # presses
    press_timer: jax.Array    # i32[2]
    press_mat: jax.Array      # i32[2]  (0..4; reference stores int 0 when idle)
    press_n: jax.Array        # i32[2]
    press_q: jax.Array        # f64[2]
    # bales (per material row: A..D,E)
    bale_size: jax.Array      # i32[5, MAX_BALES]
    bale_qual: jax.Array      # i32[5, MAX_BALES]
    bale_cnt: jax.Array       # i32[5]
    # reward bookkeeping
    last_press_started: jax.Array  # bool
    last_press_amount: jax.Array   # i32
    press_penalty_flag: jax.Array  # i32
    # input generator pattern machine
    gen_pattern_seq: jax.Array   # i32[2] (shuffled pattern keys 1/2)
    gen_pattern_idx: jax.Array   # i32
    gen_step_counter: jax.Array  # i32
    # counters / diagnostics
    current_step: jax.Array      # i32
    total_input_units: jax.Array  # i32
    error_flag: jax.Array        # i32 (nonzero => conservation violation)
    # RNG streams
    rng_input: PCG64State
    rng_sorting: PCG64State
    rng_pressing: PCG64State
    rng_noise: PCG64State
    rng: PCG64State
    gen_rng: PCG64State
    # exact-engine (TPU-bit-exact) view of the accuracies as IEEE-754 f64
    # bit patterns: TPU hardware f64 is ~49-bit, so noise>0 accuracies
    # cannot live in the f64 fields without losing bits.  Maintained by
    # exact_dynamics.update_accuracy_exact; the f64 fields stay the
    # authoritative view for the CPU parity engine.
    acc_belt_bits: jax.Array   # u64[4]
    acc_sorter_bits: jax.Array  # u64[4]


def reset(cfg: SimConfig, seed) -> EnvState:
    """Seeded reset, equal to reference ``reset(seed=s)`` with s not None
    (env_super.py:365-420): recreates the five streams from seed+k
    (env_super.py:170-174), recreates the input generator from the raw seed
    and draws its pattern permutation (input_generator.py:26-30).

    ``seed`` may be a scalar or an array of per-instance seeds (the batch
    dimension of the returned state follows the seed shape).
    """
    seeds = np.asarray(seed, dtype=np.int64)
    shape = seeds.shape
    eff = seeds  # reference: ``self.seed = seed or 0`` (None handled upstream)

    def z(*dims, dtype=I32):
        return jnp.zeros(shape + dims, dtype)

    gen_rng = pcg64_init(seeds)  # raw seed (env_super.py:110,375)
    # pattern permutation: Fisher-Yates on [1, 2] -> one interval32 draw
    j, gen_rng = _vmapped_interval1(gen_rng, shape)
    base = jnp.array([1, 2], I32)
    base = jnp.broadcast_to(base, shape + (2,))
    # swap positions 1 and j (j in {0, 1})
    swapped = jnp.stack([base[..., 1], base[..., 0]], axis=-1)
    pattern_seq = jnp.where((j == 0)[..., None], swapped, base)

    st = EnvState(
        input_counts=z(4),
        belt_counts=z(4),
        sort_counts=z(4),
        acc_belt=jnp.broadcast_to(jnp.asarray(cfg.baseline_accuracy, F64), shape + (4,)),
        acc_sorter=jnp.broadcast_to(jnp.asarray(cfg.baseline_accuracy, F64), shape + (4,)),
        sensor_setting=z(),
        input_occupancy=z(dtype=F64),
        belt_occupancy=z(dtype=F64),
        cont_true=z(5),
        cont_false=z(4),
        press_timer=z(2),
        press_mat=z(2),
        press_n=z(2),
        press_q=z(2, dtype=F64),
        bale_size=z(5, cfg.max_bales),
        bale_qual=z(5, cfg.max_bales),
        bale_cnt=z(5),
        last_press_started=jnp.zeros(shape, bool),
        last_press_amount=z(),
        press_penalty_flag=z(),
        gen_pattern_seq=pattern_seq,
        gen_pattern_idx=z(),
        gen_step_counter=z(),
        current_step=z(),
        total_input_units=z(),
        error_flag=z(),
        rng_input=pcg64_init(eff + 1),
        rng_sorting=pcg64_init(eff + 2),
        rng_pressing=pcg64_init(eff + 3),
        rng_noise=pcg64_init(eff + 4),
        rng=pcg64_init(eff + 99),
        gen_rng=gen_rng,
        acc_belt_bits=jnp.broadcast_to(
            jnp.asarray(np.asarray(cfg.baseline_accuracy,
                                   np.float64).view(np.uint64)),
            shape + (4,)),
        acc_sorter_bits=jnp.broadcast_to(
            jnp.asarray(np.asarray(cfg.baseline_accuracy,
                                   np.float64).view(np.uint64)),
            shape + (4,)),
    )
    return st


def _vmapped_interval1(gen_rng: PCG64State, shape):
    draw = lambda s: random_interval32(s, jnp.uint32(1))
    f = draw
    for _ in range(len(shape)):
        f = jax.vmap(f)
    return f(gen_rng)
