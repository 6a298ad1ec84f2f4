"""Checkpointing: SB3-style model zips -> npz pytrees, with the
reference's rotation/find-latest semantics, plus full-train-state
checkpoint/restore for resumable runs.

Reference counterparts:
* ``save_model`` (training.py:271-287): save ``{prefix}_{timesteps}``,
  rotating older files with the same prefix into ``models/prev/``.
* ``find_latest_model`` (training.py:31-45): newest by mtime.
* best-model checkpoint fallback (training.py:199-209) is implemented in
  ``learn.trainer``.
* full-state resume (learner params + optimizer state + env state + RNG
  stream state) has no reference counterpart (SURVEY.md §5) and uses
  orbax.
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat, treedef = jax.tree_util.tree_flatten(tree)
    out = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    out["__num_leaves__"] = np.asarray(len(flat))
    return out


def save_pytree(path: str, tree) -> None:
    np.savez(path, **_flatten(tree))


def load_pytree(path: str, like) -> Any:
    """Load leaves saved by save_pytree into the structure of ``like``."""
    data = np.load(path)
    n = int(data["__num_leaves__"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    treedef = jax.tree_util.tree_structure(like)
    assert treedef.num_leaves == n, (treedef.num_leaves, n)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_model(params, prefix: str, timesteps: int,
               models_dir: str = "./models") -> str:
    """Save with rotation (reference training.py:271-287)."""
    os.makedirs(models_dir, exist_ok=True)
    fname = f"{prefix}_{timesteps}.npz"
    fpath = os.path.join(models_dir, fname)

    existing = [f for f in os.listdir(models_dir)
                if f.startswith(prefix) and f.endswith(".npz")]
    if existing:
        prev_dir = os.path.join(models_dir, "prev")
        os.makedirs(prev_dir, exist_ok=True)
        for old in existing:
            shutil.move(os.path.join(models_dir, old),
                        os.path.join(prev_dir, old))

    save_pytree(fpath, params)
    return fpath


def find_latest_model(prefix: str,
                      models_dir: str = "./models") -> Optional[str]:
    """Newest file with the prefix, by mtime (training.py:31-45)."""
    pattern = os.path.join(models_dir, f"{prefix}_*.npz")
    files = glob.glob(pattern)
    if not files:
        return None
    return max(files, key=os.path.getmtime)


def load_model(path: str, like) -> Any:
    return load_pytree(path, like)


# --- full train-state checkpoint (orbax) ---------------------------------

def save_train_state(ckpt_dir: str, step: int, train_state) -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, f"step_{step}"),
                   jax.tree.map(np.asarray, train_state), force=True)


def restore_train_state(ckpt_dir: str, step: int, like):
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.join(ckpt_dir, f"step_{step}"),
            jax.tree.map(np.asarray, like))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like),
        jax.tree_util.tree_leaves(restored))


def prune_train_states(ckpt_dir: str, keep: int = 2) -> None:
    """Delete all but the ``keep`` newest ``step_*`` checkpoints."""
    if not os.path.isdir(ckpt_dir):
        return
    steps = []
    for d in os.listdir(ckpt_dir):
        if d.startswith("step_"):
            try:
                steps.append(int(d.split("_")[1]))
            except ValueError:
                pass
    for s in sorted(steps)[:-keep] if keep else sorted(steps):
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"),
                      ignore_errors=True)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        if d.startswith("step_"):
            try:
                steps.append(int(d.split("_")[1]))
            except ValueError:
                pass
    return max(steps) if steps else None
