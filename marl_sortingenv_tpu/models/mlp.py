"""SB3-compatible actor-critic MLP (``MlpPolicy`` /
``MaskableActorCriticPolicy`` with ``net_arch=dict(pi=[32,32], vf=[32,32])``,
reference ``src/training.py:115``).

Architecture parity with SB3:
* separate pi and vf towers on the flat observation, Tanh activations
  (SB3 default ``activation_fn=nn.Tanh``),
* ``action_net``: Linear(last_pi, n_actions); ``value_net``: Linear(last_vf, 1),
* orthogonal init with gains sqrt(2) (hidden), 0.01 (action head), 1.0
  (value head); zero biases — SB3's ``ActorCriticPolicy.init_weights``.

Implemented as raw parameter pytrees + pure functions so the forward pass
can be fused *inside* the jitted environment step (the hierarchical
frozen-policy mechanism, reference ``env_2_press.py:106-109``) and sharded
with ``pjit`` without framework overhead.  f32 throughout — the policy is
not part of the bit-parity surface (SB3 itself is torch f32).

It can also ingest weights exported from an actual SB3 checkpoint
(``from_torch_state_dict``) so reference-trained agents can be evaluated
on-device.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Dense(NamedTuple):
    w: jax.Array  # [in, out]
    b: jax.Array  # [out]


class ACParams(NamedTuple):
    pi: Tuple[Dense, ...]
    vf: Tuple[Dense, ...]
    action: Dense
    value: Dense


def _orthogonal(key, shape, gain):
    """Orthogonal init (same scheme as torch.nn.init.orthogonal_)."""
    n_rows, n_cols = shape
    flat = jax.random.normal(key, (max(n_rows, n_cols), min(n_rows, n_cols)),
                             jnp.float32)
    q, r = jnp.linalg.qr(flat)
    q = q * jnp.sign(jnp.diagonal(r))
    if n_rows < n_cols:
        q = q.T
    return gain * q[:n_rows, :n_cols]


def init_params(key, obs_dim: int, n_actions: int,
                hidden: Sequence[int] = (32, 32)) -> ACParams:
    keys = jax.random.split(key, 2 * len(hidden) + 2)
    k = iter(keys)

    def tower(dims):
        layers = []
        d_in = obs_dim
        for d_out in dims:
            layers.append(
                Dense(_orthogonal(next(k), (d_in, d_out), float(np.sqrt(2))),
                      jnp.zeros(d_out, jnp.float32))
            )
            d_in = d_out
        return tuple(layers), d_in

    pi, d_pi = tower(hidden)
    vf, d_vf = tower(hidden)
    action = Dense(_orthogonal(next(k), (d_pi, n_actions), 0.01),
                   jnp.zeros(n_actions, jnp.float32))
    value = Dense(_orthogonal(next(k), (d_vf, 1), 1.0),
                  jnp.zeros(1, jnp.float32))
    return ACParams(pi=pi, vf=vf, action=action, value=value)


def _tower(layers, x):
    for lyr in layers:
        x = jnp.tanh(x @ lyr.w + lyr.b)
    return x


def policy_logits(params: ACParams, obs) -> jax.Array:
    """Action logits for a single obs or a batch (f32)."""
    x = jnp.asarray(obs, jnp.float32)
    h = _tower(params.pi, x)
    return h @ params.action.w + params.action.b


def value_fn(params: ACParams, obs) -> jax.Array:
    x = jnp.asarray(obs, jnp.float32)
    h = _tower(params.vf, x)
    return (h @ params.value.w + params.value.b)[..., 0]


def logits_and_value(params: ACParams, obs):
    return policy_logits(params, obs), value_fn(params, obs)


def masked_logits(logits, mask):
    """MaskableCategorical semantics: invalid logits -> dtype min."""
    neg = jnp.finfo(logits.dtype).min
    return jnp.where(mask, logits, neg)


# --- batch-last (feature-major) forwards -----------------------------------
# Same math as policy_logits/value_fn but on (feat, batch) operands:
# w.T @ h contracts the identical K sequence, so the MXU accumulation
# matches; the layout matches the MXU's operand preference (contraction
# dim major), which removes the per-minibatch transposed copies XLA
# otherwise inserts in the PPO update loop (see learn/ppo.py).

def _tower_bl(layers, x):
    for lyr in layers:
        x = jnp.tanh(lyr.w.T @ x + lyr.b[:, None])
    return x


def policy_logits_bl(params: ACParams, obs_bl) -> jax.Array:
    """Action logits for a batch-last obs (D, B) -> (A, B)."""
    h = _tower_bl(params.pi, jnp.asarray(obs_bl, jnp.float32))
    return params.action.w.T @ h + params.action.b[:, None]


def value_fn_bl(params: ACParams, obs_bl) -> jax.Array:
    """Values for a batch-last obs (D, B) -> (B,)."""
    h = _tower_bl(params.vf, jnp.asarray(obs_bl, jnp.float32))
    return (params.value.w.T @ h + params.value.b[:, None])[0]


def predict_deterministic(params: ACParams, obs, mask=None) -> jax.Array:
    """SB3 ``predict(deterministic=True)``: argmax over (masked) logits."""
    logits = policy_logits(params, obs)
    if mask is not None:
        logits = masked_logits(logits, mask)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def load_sb3_zip(path: str) -> ACParams:
    """``load_ppo_model`` equivalent (reference
    ``utils/benchmark_models.py:190-192``) without requiring SB3: an SB3
    ``.zip`` checkpoint stores the torch policy state dict in
    ``policy.pth``; read it directly and convert."""
    import io
    import zipfile

    import torch

    with zipfile.ZipFile(path) as zf:
        with zf.open("policy.pth") as f:
            sd = torch.load(io.BytesIO(f.read()), map_location="cpu",
                            weights_only=True)
    return from_torch_state_dict(
        {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")})


def from_torch_state_dict(sd) -> ACParams:
    """Build ACParams from an SB3 policy ``state_dict`` (numpy-convertible
    mapping).  Keys follow SB3's MlpExtractor naming."""

    def dense(prefix):
        w = np.asarray(sd[f"{prefix}.weight"], np.float32).T  # torch [out,in]
        b = np.asarray(sd[f"{prefix}.bias"], np.float32)
        return Dense(jnp.asarray(w), jnp.asarray(b))

    pi, vf = [], []
    i = 0
    while f"mlp_extractor.policy_net.{i}.weight" in sd:
        pi.append(dense(f"mlp_extractor.policy_net.{i}"))
        i += 2  # Linear, Tanh, Linear, Tanh ...
    i = 0
    while f"mlp_extractor.value_net.{i}.weight" in sd:
        vf.append(dense(f"mlp_extractor.value_net.{i}"))
        i += 2
    return ACParams(
        pi=tuple(pi),
        vf=tuple(vf),
        action=dense("action_net"),
        value=dense("value_net"),
    )
