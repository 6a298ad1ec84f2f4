"""Integer-exact (fixed-point) MLP policy forward — the last piece of the
TPU-bit-exact surface (STATUS known-gap 2).

The f32 ``models.mlp`` forward is NOT bit-portable between CPU and the
TPU MXU (fused-multiply-add order and tanh libm differ), so the exact
engine (``core.exact_dynamics``) historically excluded every
model-in-the-loop action path.  This module removes that exclusion: a
Q14 fixed-point policy tower evaluated in pure integer arithmetic
(i64 accumulation, a host-baked integer tanh table, integer argmax) is
bit-identical on every backend, so frozen-policy trajectories become
part of the TPU-bit-exact surface.  Requires x64 (like the rest of the
exact engine's u64/i64 kernel).

The quantized policy is a *deterministic surrogate* of the f32 policy:
actions agree with the float forward's argmax on ~all benchmark states
(measured in ``tests/test_mlp_exact.py`` and
``artifacts/mlp_exact_tpu.log``), but the authoritative definition of
the exact-engine model path is the integer computation itself — like
the reference's torch-f32 policy, it is its own spec.

Reference behavior being reproduced: SB3 ``predict(deterministic=True)``
(argmax over (masked) logits) inside the env step — the hierarchical
frozen-sort-agent mechanism of Env_2_Pressing (env_2_press.py:106-109)
and the monolith 'model' path (env_monolith.py:186-221).

Numerics:
* scale S = 2**14; obs (already clipped to [-1, 1]) quantize to Q14 via
  ``rint(obs * S)`` — an exact f32 op (power-of-two scale, IEEE rint)
  identical on every backend;
* weights Q14 (i32), biases Q28 (i64), both host-rounded once;
* per layer: i64 accumulate (products are Q28), add bias, arithmetic
  shift back to Q14, saturating integer tanh via a 131073-entry table
  (tanh on [-4, 4]; |x| > 4 saturates — tanh(4) rounds to 16373/16384);
* final layer logits stay Q28 i64 (no tanh) for maximal argmax
  resolution; masked predict replaces invalid entries with i64 min/2.

Q14 was picked over Q12 by measurement: argmax agreement with the f32
policy on random-init params (the worst case — the 0.01-gain action
head makes logit gaps tiny) rises 0.941 -> 0.992, trained flagship
agents sit at 0.995-0.9995 either way (tests).

The tanh table is baked from numpy's f64 tanh at import; its content is
pinned by checksum in ``tests/test_mlp_exact.py`` so a libm change would
be caught rather than silently shift trajectories.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import mlp

FRAC = 14
SCALE = 1 << FRAC                    # 16384
TANH_IN_MAX = 4 * SCALE              # saturate |x| > 4.0 (tanh(4) ~ 0.99933)

I32 = jnp.int32
I64 = jnp.int64

# host-baked integer tanh: _TANH_TABLE[i + TANH_IN_MAX] = rint(tanh(i/S)*S)
_TANH_TABLE = np.rint(
    np.tanh(np.arange(-TANH_IN_MAX, TANH_IN_MAX + 1, dtype=np.float64)
            / SCALE) * SCALE).astype(np.int32)


def tanh_table_checksum() -> int:
    """Stable fingerprint of the baked table (pinned in tests)."""
    import zlib

    return zlib.crc32(_TANH_TABLE.tobytes())


class QDense(NamedTuple):
    w: jax.Array  # i32 [in, out], Q14
    b: jax.Array  # i64 [out], Q28


class QPolicy(NamedTuple):
    pi: Tuple[QDense, ...]
    action: QDense


def quantize_policy(params: mlp.ACParams) -> QPolicy:
    """Host-side one-time quantization of the f32 policy tower (f64
    rint — exact and backend-independent: runs in numpy)."""

    def q(lyr: mlp.Dense) -> QDense:
        wq = np.rint(np.asarray(lyr.w, np.float64) * SCALE)
        bq = np.rint(np.asarray(lyr.b, np.float64) * SCALE * SCALE)
        if np.abs(wq).max(initial=0) >= 2**31:
            raise ValueError("weight out of Q14 i32 range")
        return QDense(jnp.asarray(wq.astype(np.int32)),
                      jnp.asarray(bq.astype(np.int64)))

    return QPolicy(pi=tuple(q(l) for l in params.pi), action=q(params.action))


def quantize_obs(obs) -> jax.Array:
    """f32 obs in [-1, 1] -> Q14 i32.  rint(obs * 16384) is exact: the
    power-of-two product introduces no rounding and IEEE round-to-even
    is backend-invariant, so identical obs bits give identical ints."""
    return jnp.rint(jnp.asarray(obs, jnp.float32)
                    * np.float32(SCALE)).astype(I32)


def _tanh_q(x_q28: jax.Array) -> jax.Array:
    """Q28 i64 pre-activation -> Q14 i32 tanh via the baked table."""
    h = jax.lax.shift_right_arithmetic(x_q28, np.int64(FRAC))  # Q28 -> Q14
    h = jnp.clip(h, -TANH_IN_MAX, TANH_IN_MAX).astype(I32)
    return jnp.asarray(_TANH_TABLE)[h + TANH_IN_MAX]


def _imatmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """i64 [..., D] @ i64 [D, O] as broadcast-multiply + reduce: exact
    (integer addition is associative — order can't matter) and avoids
    s64 ``dot_general``, which TPU lowers poorly; the towers are 32-wide
    so the elementwise form is also the faster lowering."""
    return jnp.sum(x[..., :, None] * w, axis=-2)


def policy_logits_q(qp: QPolicy, obs_q: jax.Array) -> jax.Array:
    """Integer policy forward: Q14 i32 obs [..., D] -> Q28 i64 logits
    [..., A].  Every op is exact integer arithmetic."""
    x = obs_q.astype(I64)
    for lyr in qp.pi:
        acc = _imatmul(x, lyr.w.astype(I64)) + lyr.b.astype(I64)  # Q28
        x = _tanh_q(acc).astype(I64)                              # Q14
    return _imatmul(x, qp.action.w.astype(I64)) + qp.action.b.astype(I64)


def predict_deterministic_q(qp: QPolicy, obs, mask=None) -> jax.Array:
    """SB3 ``predict(deterministic=True)`` in integers: argmax over
    (masked) Q28 logits.  Ties break to the lowest index on every
    backend (XLA argmax semantics)."""
    logits = policy_logits_q(qp, quantize_obs(obs))
    if mask is not None:
        neg = jnp.asarray(jnp.iinfo(jnp.int64).min // 2, I64)
        logits = jnp.where(mask, logits, neg)
    return jnp.argmax(logits, axis=-1).astype(I32)


def logits_q_as_f64(qp: QPolicy, obs) -> jax.Array:
    """The integer logits exactly represented in f64 (|Q28 logits| << 2^53)
    — lets the quantized policy plug into the parity engine's float
    ``apply_fn`` slots (``core.step._masked_mlp_predict``) for
    cross-engine trajectory tests."""
    return policy_logits_q(qp, quantize_obs(obs)).astype(jnp.float64)
