"""Checkpoint / resume for training state.

The reference saves full state_dicts at milestones (sugar_model.py:2296-2301,
coarse_sdf.py:782-793) and each downstream stage reloads from disk. Here the
same milestone pattern is provided over orbax (preferred, atomic + async)
with a numpy-npz fallback, covering model params, Adam state, densifier
stats and the iteration counter so any stage can resume idempotently
(SURVEY.md §5 failure-recovery note).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, state: dict[str, Any]) -> None:
    """Save a pytree-of-arrays dict. Uses orbax when available."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.abspath(path), _to_pure(state), force=True)
        ckpt.wait_until_finished()
        return
    except Exception:
        pass
    flat, treedef = jax.tree.flatten(_to_pure(state))
    np.savez_compressed(
        path if path.endswith(".npz") else path + ".npz",
        treedef=np.frombuffer(repr(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
    )


def load_checkpoint(path: str, like: dict[str, Any]) -> dict[str, Any]:
    """Restore a checkpoint into the structure of ``like``."""
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(path):
            ckpt = ocp.StandardCheckpointer()
            return ckpt.restore(os.path.abspath(path), _to_pure(like))
    except Exception:
        pass
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    flat_like, treedef = jax.tree.flatten(_to_pure(like))
    flat = [data[f"leaf_{i}"] for i in range(len(flat_like))]
    return jax.tree.unflatten(treedef, flat)


def _to_pure(tree):
    """Registered dataclasses -> plain dicts for serializer compatibility."""

    def convert(x):
        if dataclasses.is_dataclass(x) and not isinstance(x, type):
            return {
                f.name: convert(getattr(x, f.name))
                for f in dataclasses.fields(x)
                if not f.metadata.get("static", False)
            }
        if isinstance(x, dict):
            return {k: convert(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(convert(v) for v in x)
        return x

    return convert(tree)


def milestone_path(base_dir: str, iteration: int) -> str:
    return os.path.join(base_dir, f"milestone_{iteration}")
