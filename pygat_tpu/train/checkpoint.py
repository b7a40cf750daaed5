"""Checkpointing with the reference's keep-best rotation policy.

The reference saves ``{epoch}_{dataset}.pkl`` every epoch, deletes files
older than the current best each epoch, deletes newer-than-best at the end,
and restores the best for testing (train.py:198-233). ``train_ppi.py`` meant
to do the same but its rotation crashes on the filename format
(train_ppi.py:198: int('0_ppi') raises) — here both trainers share this one
correct implementation of the intended behavior.

Format: a single ``.npz`` per checkpoint (pickle-free): leaves stored by
flattened index + a tiny JSON header with step/epoch metadata. Restoring
requires a template state with the same tree structure (always available
from init).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import numpy as np

_FNAME = re.compile(r"^(\d+)_(.+)\.ckpt\.npz$")


def _path(ckpt_dir: str, epoch: int, tag: str) -> str:
    return os.path.join(ckpt_dir, f"{epoch}_{tag}.ckpt.npz")


def save(ckpt_dir: str, epoch: int, tag: str, state: Any, extra: dict | None = None) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    header = json.dumps({"epoch": epoch, "tag": tag, "n_leaves": len(leaves), **(extra or {})})
    payload["header"] = np.frombuffer(header.encode(), dtype=np.uint8)
    path = _path(ckpt_dir, epoch, tag)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)  # atomic publish
    return path


def restore(path: str, like: Any) -> tuple[Any, dict]:
    """Load into the structure of ``like``; returns (state, header)."""
    with np.load(path) as z:
        header = json.loads(bytes(z["header"]).decode())
        leaves, treedef = jax.tree_util.tree_flatten(like)
        if header["n_leaves"] != len(leaves):
            raise ValueError(
                f"checkpoint has {header['n_leaves']} leaves, template has {len(leaves)}"
            )
        new_leaves = []
        for i, old in enumerate(leaves):
            arr = z[f"leaf_{i}"]
            if tuple(arr.shape) != tuple(np.shape(old)):
                raise ValueError(f"leaf {i}: shape {arr.shape} != template {np.shape(old)}")
            new_leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves), header


def list_checkpoints(ckpt_dir: str, tag: str) -> list[tuple[int, str]]:
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        m = _FNAME.match(name)
        if m and m.group(2) == tag:
            out.append((int(m.group(1)), os.path.join(ckpt_dir, name)))
    return sorted(out)


def latest(ckpt_dir: str, tag: str) -> tuple[int, str] | None:
    """(epoch, path) of the newest checkpoint for ``tag``, or None."""
    cks = list_checkpoints(ckpt_dir, tag)
    return cks[-1] if cks else None


def rotate_below_best(ckpt_dir: str, tag: str, best_epoch: int) -> None:
    """Per-epoch rotation: drop checkpoints older than best (train.py:213-217)."""
    for epoch, path in list_checkpoints(ckpt_dir, tag):
        if epoch < best_epoch:
            os.remove(path)


def rotate_above_best(
    ckpt_dir: str, tag: str, best_epoch: int, keep_epoch: int | None = None
) -> None:
    """Final rotation: drop checkpoints newer than best (train.py:220-224).

    ``keep_epoch`` (the run's final epoch) survives alongside the best one so
    a later ``resume=True`` is a true continuation rather than a silent
    replay of all post-best epochs from the best checkpoint.
    """
    for epoch, path in list_checkpoints(ckpt_dir, tag):
        if epoch > best_epoch and epoch != keep_epoch:
            os.remove(path)


def best_path(ckpt_dir: str, tag: str, best_epoch: int) -> str:
    return _path(ckpt_dir, best_epoch, tag)
