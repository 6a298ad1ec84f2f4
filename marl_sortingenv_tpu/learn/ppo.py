"""On-device (Maskable) PPO learner — the SB3 ``PPO`` /
``MaskablePPO`` equivalent (reference ``src/training.py:118-143``), built
for thousands of vectorized env instances.

Algorithmic parity with SB3 (defaults that shape the learning curve):
``n_steps=2048, batch_size=64, n_epochs=10, gamma=0.99, gae_lambda=0.95,
clip_range=0.2, normalize_advantage=True (per minibatch), vf_coef=0.5,
max_grad_norm=0.5, lr=3e-4, Adam eps=1e-5``; the reference overrides
``ent_coef=0.05`` and ``seed=42``.  Done flags are treated as true
terminals (the reference returns its time-limit in the ``terminated``
slot, so SB3 does not bootstrap — neither do we).

The rollout is a ``lax.scan`` of the vmapped env step with the policy
fused in (obs/masks/actions never leave the device); the update is a
scan over permuted minibatches.  The whole ``train_iteration`` is one
jitted function, shardable over a mesh (see ``parallel/``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from ..config.config import SimConfig
from ..core import dynamics as D
from ..core import fast as FE
from ..core import fastb as FB
from ..core import step as ST
from ..core import wrappers as W
from ..core.state import EnvState
from ..models import mlp

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    n_steps: int = 2048          # steps per env per iteration
    batch_size: int = 64         # minibatch size (flattened samples)
    n_epochs: int = 10
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ent_coef: float = 0.05       # reference training.py:128/140
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    learning_rate: float = 3e-4
    adam_eps: float = 1e-5
    normalize_advantage: bool = True
    # minibatch shuffle granularity.  1 = SB3's exact semantics (uniform
    # permutation of all T*N samples).  B>1 permutes contiguous B-row
    # blocks of the [T, N]-flattened batch instead: with N >= B each block
    # is B *different env instances at one timestep* (nearly independent
    # samples), the HBM gather runs at full bandwidth instead of
    # 116-byte random rows, and the permutation sorts total/B keys
    # instead of total.  Falls back to 1 when B doesn't divide the batch.
    shuffle_block: int = 1
    # lax.scan unroll factors (pure scheduling — identical math/results):
    # the TPU while-loop costs a fixed per-iteration overhead, so
    # unrolling the 64-step rollout scan and the per-minibatch update
    # scan trades code size for fewer loop trips.  1 = no unrolling.
    rollout_unroll: int = 1
    mb_unroll: int = 1
    # materialize the gathered minibatch behind an optimization barrier
    # (round-3 finding: without it XLA fused the gather into the first
    # dot_general's operand and fell off the MXU fast path).  Kept as a
    # knob so the finding stays re-measurable as layouts change.
    mb_barrier: bool = True

    @classmethod
    def tuned(cls, **over) -> "PPOConfig":
        """Preset that dominates the reference-mirroring defaults at the
        100k-step protocol budget (swept on-device: press eval -11.7 vs
        -57.4 for the defaults; modular masked benchmark 75.8 vs 20.0).
        Defaults mirror SB3/reference settings for comparability; use
        this for best results at small budgets."""
        kw = dict(learning_rate=1e-3, ent_coef=0.01)
        kw.update(over)
        return cls(**kw)


@dataclasses.dataclass(frozen=True)
class VariantSpec:
    """Learner-facing description of one env variant.

    ``engine``: 'parity' (bit-exact u64/f64 engine, CPU-friendly),
    'fast' (f32/i32/threefry per-env TPU engine, distribution-equivalent,
    batched via vmap), or 'fastb' (same dynamics/streams as 'fast' but
    batch-last struct-of-arrays layout — the high-throughput TPU path)."""
    name: str                 # 'sort' | 'press' | 'mono'
    obs_dim: int
    n_actions: int
    use_mask: bool
    engine: str = "parity"

    def _mod(self):
        return {"fast": FE, "fastb": FB}.get(self.engine, D)

    def mask_fn(self, cfg: SimConfig, st):
        mod = self._mod()
        if self.name == "press":
            return mod.press_action_masks(cfg, st)
        if self.name == "mono":
            return mod.monolith_action_masks(cfg, st)
        return jnp.ones(self.n_actions, bool)

    def obs_fn(self, cfg: SimConfig, st):
        mod = self._mod()
        if self.name == "sort":
            return mod.get_sort_obs(cfg, st)
        if self.name == "press":
            return mod.get_press_obs(cfg, st)
        return mod.get_mono_obs(cfg, st)

    def step_fn(self, sort_policy=None, use_action_masking=True):
        if self.engine in ("fast", "fastb"):
            mod = self._mod()
            if self.name == "sort":
                return mod.step_sort
            if self.name == "press":
                return lambda cfg, st, a: mod.step_press(
                    cfg, st, a, sort_policy, use_action_masking)
            f = lambda cfg, st, a: mod.step_mono_external(  # noqa: E731
                cfg, st, a, use_action_masking)
            # tag so batched_autoreset_step can PROVE the fused-kernel
            # fast path it substitutes is equivalent to this step, and
            # fall back loudly-correctly for any other mono step_fn
            f._mono_step = ("external", use_action_masking)
            return f
        if self.name == "sort":
            return ST.step_sort
        if self.name == "press":
            return lambda cfg, st, a: ST.step_press(
                cfg, st, a, sort_policy, use_action_masking)
        return lambda cfg, st, a: ST.step_mono_external(
            cfg, st, a, use_action_masking)

    def wrap_autoreset(self, cfg: SimConfig, step_fn):
        if self.engine in ("fast", "fastb"):
            return self._mod().with_autoreset(cfg, step_fn)
        return W.with_autoreset(cfg, step_fn)

    def reset_batch(self, cfg: SimConfig, n_envs: int, seed0: int = 0):
        if self.engine in ("fast", "fastb"):
            return self._mod().reset_batch(
                cfg, jax.random.PRNGKey(seed0), n_envs)
        from ..core import state as S

        return S.reset(cfg, np.arange(seed0, seed0 + n_envs))

    # --- batched accessors: 'fastb' functions are natively batched
    # (obs [N, d], masks [N, A], step over BState); per-env engines get
    # vmapped here so all learner code paths are layout-agnostic.

    def batched_obs(self, cfg: SimConfig):
        if self.engine == "fastb":
            return lambda st: self.obs_fn(cfg, st)
        return jax.vmap(lambda s: self.obs_fn(cfg, s))

    def batched_masks(self, cfg: SimConfig):
        if self.engine == "fastb":
            if self.name == "sort":
                return lambda st: jnp.ones(
                    (st.current_step.shape[0], self.n_actions), bool)
            return lambda st: self.mask_fn(cfg, st)
        return jax.vmap(lambda s: self.mask_fn(cfg, s))

    def batched_step(self, cfg: SimConfig, step_fn):
        if self.engine == "fastb":
            return lambda st, a: step_fn(cfg, st, a)
        return jax.vmap(lambda s, a: step_fn(cfg, s, a))

    def batched_autoreset_step(self, cfg: SimConfig, step_fn,
                               use_action_masking: bool = True):
        if self.engine == "fastb":
            tag = getattr(step_fn, "_mono_step", None)
            if self.name == "mono" and tag is not None:
                # fuses the terminated-instance reset into the full-step
                # kernel when it applies (falls back to the generic
                # wrapper otherwise) — bitwise-identical either way.
                # The substitution is only valid because the tag proves
                # step_fn IS step_mono_external with this masking flag;
                # an untagged custom mono step takes the generic wrapper
                # below instead of being silently replaced (ADVICE r4).
                variant, masked = tag
                if masked != use_action_masking:
                    raise ValueError(
                        "step_fn was built with use_action_masking="
                        f"{masked} but batched_autoreset_step got "
                        f"{use_action_masking}")
                return FB.mono_autoreset_step(cfg, variant, masked)
            return self.wrap_autoreset(cfg, step_fn)
        return jax.vmap(self.wrap_autoreset(cfg, step_fn))


SORT_SPEC = VariantSpec("sort", 13, 2, use_mask=False)
PRESS_SPEC = VariantSpec("press", 16, 11, use_mask=True)
MONO_SPEC = VariantSpec("mono", 29, 22, use_mask=True)


def spec_for(name: str, engine: str = "parity") -> VariantSpec:
    base = {"sort": SORT_SPEC, "press": PRESS_SPEC, "mono": MONO_SPEC}[name]
    return dataclasses.replace(base, engine=engine)


class Transition(NamedTuple):
    """Rollout buffer, BATCH-LAST for obs/mask: the fastb engine builds
    obs/masks feature-major (feat, N) natively, and the PPO update wants
    feature-major minibatches (MXU contraction-dim-major; see _loss_fn)
    — storing them batch-first made the rollout scan emit feature-minor
    layouts that degraded the whole update loop ~10x."""
    obs: jax.Array      # [T, obs_dim, N] f32
    mask: jax.Array     # [T, A, N] bool
    action: jax.Array   # [T, N] i32
    logp: jax.Array     # [T, N] f32
    value: jax.Array    # [T, N] f32
    reward: jax.Array   # [T, N] f32
    done: jax.Array     # [T, N] bool


class TrainState(NamedTuple):
    params: mlp.ACParams
    opt_state: Any
    env_state: EnvState   # batched [N]
    obs: jax.Array        # [N, obs_dim]
    key: jax.Array
    # running episode-return accumulators (device-side Monitor equivalent)
    ep_return_acc: jax.Array   # [N] f64
    last_ep_return: jax.Array  # [N] f64
    update_count: jax.Array    # i32


def make_optimizer(pcfg: PPOConfig):
    # optax.flatten: run clip+adam on ONE raveled parameter vector
    # instead of the 12-leaf ACParams pytree — the actor-critic is tiny
    # (~3.3k params), so per-leaf Adam is ~100 microscopic ops per grad
    # step and pure dispatch latency on TPU; flattened it is ~10 ops.
    # Same elementwise math (global-norm association differs by leaf
    # concatenation order only; the learner is not a bit-parity surface).
    return optax.flatten(optax.chain(
        optax.clip_by_global_norm(pcfg.max_grad_norm),
        optax.adam(pcfg.learning_rate, eps=pcfg.adam_eps),
    ))


def init_train_state(cfg: SimConfig, pcfg: PPOConfig, spec: VariantSpec,
                     n_envs: int, seed: int = 42,
                     env_seed0: int = 0) -> TrainState:
    key = jax.random.PRNGKey(seed)
    key, pkey = jax.random.split(key)
    params = mlp.init_params(pkey, spec.obs_dim, spec.n_actions)
    opt_state = make_optimizer(pcfg).init(params)
    env_state = spec.reset_batch(cfg, n_envs, env_seed0)
    obs = spec.batched_obs(cfg)(env_state)
    return TrainState(
        params=params,
        opt_state=opt_state,
        env_state=env_state,
        obs=obs,
        key=key,
        ep_return_acc=jnp.zeros(
            n_envs, jnp.float64 if spec.engine == "parity" else jnp.float32),
        last_ep_return=jnp.zeros(
            n_envs, jnp.float64 if spec.engine == "parity" else jnp.float32),
        update_count=jnp.zeros((), jnp.int32),
    )


def _sample(params, obs, mask, key):
    """Masked categorical sample + logp + value (batch)."""
    logits = mlp.policy_logits(params, obs)
    logits = mlp.masked_logits(logits, mask)
    logp_all = jax.nn.log_softmax(logits, axis=-1)
    action = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    # one-hot select == take_along_axis bitwise (single nonzero addend)
    # but avoids the slow per-row dynamic gather lowering on TPU
    onehot = (lax.broadcasted_iota(jnp.int32, logp_all.shape,
                                   logp_all.ndim - 1)
              == action[..., None])
    logp = jnp.sum(jnp.where(onehot, logp_all, 0.0), axis=-1)
    value = mlp.value_fn(params, obs)
    return action, logp, value


def collect_rollout(cfg: SimConfig, pcfg: PPOConfig, spec: VariantSpec,
                    ts: TrainState, step_fn,
                    use_action_masking: bool = True, mesh=None
                    ) -> Tuple[TrainState, Transition, jax.Array]:
    """Scan n_steps of policy+env; returns transitions and last values.
    With masking off the policy samples the plain categorical (SB3's
    non-maskable PPO path) and the env sanitizes invalid actions.

    ``mesh``: when given (fastb engine only) the env step runs under
    ``jax.shard_map`` over the mesh's dp axis — the production multi-chip
    path (``parallel.fastb_shard``); everything else in the rollout is
    sharding-invariant jit code (partitionable threefry), so the rollout
    is bitwise identical to the unsharded one."""
    batched = spec.batched_autoreset_step(cfg, step_fn, use_action_masking)
    if mesh is not None:
        if spec.engine != "fastb":
            raise ValueError(
                "mesh-sharded rollouts run on the production fastb "
                f"engine (got engine={spec.engine!r}); the per-env fast "
                "engine shards via parallel.mesh.shard_env_state instead")
        from ..parallel import fastb_shard as FS
        batched = FS.shard_step(mesh, batched, ts.env_state)
    masks_of = spec.batched_masks(cfg)
    n = ts.obs.shape[0]
    ones = jnp.ones((n, spec.n_actions), bool)

    def body(carry, _):
        env_state, obs, key, acc, last_ret = carry
        mask = masks_of(env_state) if use_action_masking else ones
        key, sk = jax.random.split(key)
        action, logp, value = _sample(ts.params, obs, mask, sk)
        env_state, out = batched(env_state, action)
        acc = acc + out.reward.astype(acc.dtype)
        last_ret = jnp.where(out.terminated, acc, last_ret)
        acc = jnp.where(out.terminated, 0.0, acc)
        # store batch-last: for fastb the .T cancels the engine's own
        # trailing transpose (obs/masks are built (feat, N) natively)
        tr = Transition(
            obs=obs.T, mask=mask.T, action=action, logp=logp, value=value,
            reward=out.reward.astype(F32), done=out.terminated,
        )
        return (env_state, out.obs, key, acc, last_ret), tr

    (env_state, obs, key, acc, last_ret), trs = lax.scan(
        body,
        (ts.env_state, ts.obs, ts.key, ts.ep_return_acc, ts.last_ep_return),
        None,
        length=pcfg.n_steps,
        unroll=pcfg.rollout_unroll,
    )
    last_value = mlp.value_fn(ts.params, obs)
    ts = ts._replace(env_state=env_state, obs=obs, key=key,
                     ep_return_acc=acc, last_ep_return=last_ret)
    return ts, trs, last_value


def compute_gae(pcfg: PPOConfig, trs: Transition, last_value):
    """SB3 GAE: deltas with (1 - done) bootstrapping, reverse scan."""
    def body(carry, x):
        gae, next_value = carry
        reward, value, done = x
        nonterminal = 1.0 - done.astype(F32)
        delta = reward + pcfg.gamma * next_value * nonterminal - value
        gae = delta + pcfg.gamma * pcfg.gae_lambda * nonterminal * gae
        return (gae, value), gae

    (_, _), advantages = lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (trs.reward, trs.value, trs.done),
        reverse=True,
    )
    returns = advantages + trs.value
    return advantages, returns


def _loss_fn(params, pcfg: PPOConfig, batch):
    """PPO clipped loss on a BATCH-LAST minibatch: obs (D, B), mask
    (A, B), action/old_logp/advantage/ret (B,).

    Feature-major operands are the MXU's preferred layout (contraction
    dim major); with batch-first minibatches XLA transposed every
    gathered minibatch and ran the elementwise chain in degenerate
    layouts — ~200us/grad-step for a ~2us computation (see
    artifacts/profile_train5.py)."""
    obs, mask, action, old_logp, advantage, ret = batch
    logits = mlp.masked_logits(mlp.policy_logits_bl(params, obs), mask)
    logp_all = jax.nn.log_softmax(logits, axis=0)          # (A, B)
    # one-hot select instead of take_along_axis: the per-column gather
    # along the sublane axis lowers to ~166us/minibatch on TPU (>80% of
    # the whole update's device time); the masked sum is bitwise the
    # same value (one nonzero addend) at ~1/100th the cost
    # (artifacts/profile_train7.py bisection)
    onehot = (lax.broadcasted_iota(jnp.int32, logp_all.shape, 0)
              == action[None, :])
    logp = jnp.sum(jnp.where(onehot, logp_all, 0.0), axis=0)
    value = mlp.value_fn_bl(params, obs)

    if pcfg.normalize_advantage:
        advantage = (advantage - advantage.mean()) / (advantage.std() + 1e-8)

    ratio = jnp.exp(logp - old_logp)
    pg1 = advantage * ratio
    pg2 = advantage * jnp.clip(ratio, 1.0 - pcfg.clip_range,
                               1.0 + pcfg.clip_range)
    policy_loss = -jnp.minimum(pg1, pg2).mean()

    value_loss = jnp.mean((ret - value) ** 2)

    # masked-categorical entropy: invalid actions have p ~= 0
    p = jnp.exp(logp_all)
    ent_terms = jnp.where(mask, p * logp_all, 0.0)
    entropy = -jnp.sum(ent_terms, axis=0).mean()

    loss = (policy_loss
            + pcfg.vf_coef * value_loss
            - pcfg.ent_coef * entropy)
    stats = {
        "loss": loss, "policy_loss": policy_loss, "value_loss": value_loss,
        "entropy": entropy,
        "approx_kl": jnp.mean(old_logp - logp),
        "clip_frac": jnp.mean(
            (jnp.abs(ratio - 1.0) > pcfg.clip_range).astype(F32)),
    }
    return loss, stats


def ppo_update(pcfg: PPOConfig, ts: TrainState, trs: Transition,
               advantages, returns):
    """n_epochs x shuffled minibatches, as SB3's training loop.

    With ``shuffle_block == 1`` (default) this is SB3's exact shuffle: a
    uniform permutation of all T*N flattened samples per epoch.  With
    ``shuffle_block = B`` the permutation (and the HBM gather) works on
    contiguous B-row blocks — see PPOConfig.shuffle_block."""
    T, N = trs.action.shape
    total = T * N
    n_mb = max(1, total // pcfg.batch_size)
    mb_size = total // n_mb

    block = pcfg.shuffle_block
    if block < 1 or total % block or mb_size % block:
        block = 1
    n_blocks = total // block
    mb_blocks = mb_size // block

    # Pack the whole flattened batch into ONE BATCH-LAST f32 buffer of
    # [D + 5, n_blocks, block]: a single gather per minibatch (axis 1)
    # instead of six, feature-major so the minibatch lands directly in
    # the layout the MXU wants (contraction dim major) with the batch on
    # the 128-lane axis — no per-minibatch transposed copies, no
    # feature-minor lane padding.  The A mask rows are packed into ONE
    # bit-field row (round 4): sum_j mask_j * 2^j < 2^A <= 2^22 is exact
    # in f32 and exactly recoverable, and the mask was ~40% of the
    # packed buffer's HBM traffic at A=22.  All other f32 round-trips
    # are exact too (action ints < 2^24).
    D = trs.obs.shape[1]
    A = trs.mask.shape[1]
    assert A <= 22, "mask bit-packing needs A <= 22 for exact f32"
    pow2 = jnp.asarray([float(1 << j) for j in range(A)], F32)
    mask_bits = jnp.tensordot(
        pow2, jnp.moveaxis(trs.mask, 0, 1).reshape(A, total).astype(F32),
        axes=(0, 0))
    packed = jnp.concatenate([
        jnp.moveaxis(trs.obs, 0, 1).reshape(D, total),
        mask_bits.reshape(1, total),
        trs.action.reshape(1, total).astype(F32),
        trs.logp.reshape(1, total),
        advantages.reshape(1, total).astype(F32),
        returns.reshape(1, total).astype(F32),
    ], axis=0).reshape(D + 5, n_blocks, block)

    def unpack(g):
        bits = g[D].astype(jnp.int32)
        mask = ((bits[None, :] >> lax.broadcasted_iota(
            jnp.int32, (A,) + bits.shape, 0)) & 1) > 0
        return (g[:D], mask, g[D + 1].astype(jnp.int32), g[D + 2],
                g[D + 3], g[D + 4])

    optimizer = make_optimizer(pcfg)
    grad_fn = jax.grad(_loss_fn, has_aux=True)

    def epoch(carry, _):
        params, opt_state, key = carry
        key, pk = jax.random.split(key)
        perm = jax.random.permutation(pk, n_blocks)[: n_mb * mb_blocks]
        perm = perm.reshape(n_mb, mb_blocks)

        def minibatch(carry, idx):
            params, opt_state = carry
            g = jnp.take(packed, idx, axis=1).reshape(-1, mb_size)
            if pcfg.mb_barrier:
                # materialize the gathered minibatch: without the barrier
                # XLA fuses the gather into the first-layer dot_general's
                # operand, which knocks it off the MXU fast path (166us vs
                # ~4us for the gather + clean matmul;
                # artifacts/profile_train5.py — re-confirmed round 4)
                g = lax.optimization_barrier(g)
            batch = unpack(g)
            grads, stats = grad_fn(params, pcfg, batch)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), stats

        (params, opt_state), stats = lax.scan(
            minibatch, (params, opt_state), perm, unroll=pcfg.mb_unroll)
        return (params, opt_state, key), jax.tree.map(jnp.mean, stats)

    (params, opt_state, key), stats = lax.scan(
        epoch, (ts.params, ts.opt_state, ts.key), None,
        length=pcfg.n_epochs)
    stats = jax.tree.map(jnp.mean, stats)
    ts = ts._replace(params=params, opt_state=opt_state, key=key,
                     update_count=ts.update_count + 1)
    return ts, stats


def make_train_iteration(cfg: SimConfig, pcfg: PPOConfig, spec: VariantSpec,
                         sort_policy=None, use_action_masking=True,
                         donate: bool = False, mesh=None):
    """One jitted PPO iteration: rollout + GAE + update.

    ``donate=True`` donates the incoming TrainState's buffers (the caller
    must use the pattern ``ts, stats = it(ts)`` and never touch the old
    ``ts`` again) — saves the copy of env state + params + opt state every
    iteration on the production path.

    ``mesh``: dp-shard the fastb env step over the mesh
    (``parallel.fastb_shard.shard_step``); place the TrainState with
    ``parallel.fastb_shard.shard_train_state`` first.  The update phase
    stays ordinary jit code on the (sharded) global transition arrays, so
    results are bitwise identical to the unsharded iteration."""
    step_fn = spec.step_fn(sort_policy, use_action_masking)

    def train_iteration(ts: TrainState):
        ts, trs, last_value = collect_rollout(cfg, pcfg, spec, ts, step_fn,
                                              use_action_masking, mesh)
        advantages, returns = compute_gae(pcfg, trs, last_value)
        ts, stats = ppo_update(pcfg, ts, trs, advantages, returns)
        stats["mean_episode_return"] = ts.last_ep_return.mean()
        return ts, stats

    return jax.jit(train_iteration, donate_argnums=(0,) if donate else ())


def make_train_run(cfg: SimConfig, pcfg: PPOConfig, spec: VariantSpec,
                   n_iters: int, sort_policy=None,
                   use_action_masking=True, mesh=None, seg_unroll: int = 1):
    """``n_iters`` PPO iterations as ONE jitted ``lax.scan`` dispatch.

    Each host dispatch costs ~1.7 ms on a tunneled TPU client; at
    protocol-scale shapes (16 envs, ~0.5 ms/iteration device time) that
    gap dominates, so the trainer dispatches segments there.  At ≥4096
    envs the iteration is ~10 ms of device time and a rolled (unroll=1)
    segment measured 5-13% SLOWER than back-to-back per-iteration
    dispatch (BENCH_r03): the while-loop body cannot alias the ~80 MB
    transition buffers across trips, costing +3.3 ms/iter of HBM
    traffic (artifacts/train_floor_r4.md §2).

    ``seg_unroll > 1`` removes exactly that penalty by unrolling the
    iteration scan: within one unrolled body XLA reuses/aliases the
    transition buffers across consecutive iterations, so the segment
    reaches per-iteration device time WITHOUT the per-dispatch host gap
    (measured round 5: see artifacts/train_run_gap_r5.md).  Cost is
    compile time/program size linear in the unroll factor — worth it for
    the repeated segment shapes the trainer caches.

    Returns ``(ts, stats)`` with each stats leaf stacked ``[n_iters]``
    so per-iteration history is preserved."""
    step_fn = spec.step_fn(sort_policy, use_action_masking)

    def segment(ts: TrainState):
        def body(ts, _):
            ts, trs, last_value = collect_rollout(
                cfg, pcfg, spec, ts, step_fn, use_action_masking, mesh)
            advantages, returns = compute_gae(pcfg, trs, last_value)
            ts, stats = ppo_update(pcfg, ts, trs, advantages, returns)
            stats["mean_episode_return"] = ts.last_ep_return.mean()
            return ts, stats

        return lax.scan(body, ts, None, length=n_iters, unroll=seg_unroll)

    return jax.jit(segment)


def evaluate(cfg: SimConfig, spec: VariantSpec, params, n_envs: int,
             n_steps: int, seed0: int = 10_000, sort_policy=None,
             use_action_masking: bool = True, deterministic: bool = True,
             key=None):
    """SB3 ``evaluate_policy`` equivalent: run episodes with the
    (deterministic) policy, return per-env cumulative rewards."""
    step_fn = spec.step_fn(sort_policy, use_action_masking)
    env_state = spec.reset_batch(cfg, n_envs, seed0)
    obs = spec.batched_obs(cfg)(env_state)
    batched = spec.batched_step(cfg, step_fn)
    masks_of = spec.batched_masks(cfg)
    if key is None:
        key = jax.random.PRNGKey(0)

    def body(carry, _):
        env_state, obs, key, total, alive = carry
        logits = mlp.policy_logits(params, obs)
        if use_action_masking:
            # SB3 predict receives the mask only when masking is enabled
            # (testing.py:40-44); without it the raw argmax/sample is used
            # and the env sanitizes invalid actions
            logits = mlp.masked_logits(logits, masks_of(env_state))
        if deterministic:
            action = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            key, sk = jax.random.split(key)
            action = jax.random.categorical(sk, logits).astype(jnp.int32)
        env_state, out = batched(env_state, action)
        # accumulate only up to (and including) the first terminal step:
        # episodes here run without autoreset, so if a variant ever
        # terminates early (e.g. overflow termination) post-terminal
        # rewards must not count toward the episode return
        total = total + out.reward * alive.astype(total.dtype)
        alive = alive & ~out.terminated
        return (env_state, out.obs, key, total, alive), None

    acc_dtype = jnp.float64 if spec.engine == "parity" else jnp.float32
    (env_state, obs, key, total, _), _ = jax.jit(
        lambda c: lax.scan(body, c, None, length=n_steps))(
            (env_state, obs, key, jnp.zeros(n_envs, acc_dtype),
             jnp.ones(n_envs, bool)))
    return total
