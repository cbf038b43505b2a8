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


def save_milestone(base_dir: str, iteration: int, state: dict[str, Any]) -> str:
    """Save a training-state milestone (reference analog: the state_dict
    saves at coarse_sdf.py:782-793 / refine.py:833-845)."""
    path = milestone_path(base_dir, iteration)
    save_checkpoint(path, state)
    return path


def latest_milestone(base_dir: str, before: int | None = None) -> int | None:
    """Highest milestone iteration saved under ``base_dir`` (< ``before``
    if given), or None. Recognizes both orbax dirs and npz fallbacks."""
    if not os.path.isdir(base_dir):
        return None
    best = None
    for name in os.listdir(base_dir):
        stem = name[:-4] if name.endswith(".npz") else name
        if not stem.startswith("milestone_"):
            continue
        try:
            it = int(stem.split("_", 1)[1])
        except ValueError:
            continue
        if before is not None and it >= before:
            continue
        if best is None or it > best:
            best = it
    return best


def load_milestone(base_dir: str, iteration: int, like: dict[str, Any]) -> dict[str, Any]:
    return load_checkpoint(milestone_path(base_dir, iteration), like)


def restore_structured(path: str, like: Any) -> Any:
    """Load a checkpoint and rebuild the dataclass structure of ``like``.

    ``like`` provides both the tree structure and the static (non-pytree)
    dataclass fields, which checkpoints do not carry."""
    return _from_pure(like, load_checkpoint(path, like))


def _from_pure(like: Any, data: Any) -> Any:
    import jax.numpy as jnp

    if dataclasses.is_dataclass(like) and not isinstance(like, type):
        kwargs = {}
        for f in dataclasses.fields(like):
            if f.metadata.get("static", False):
                kwargs[f.name] = getattr(like, f.name)
            else:
                kwargs[f.name] = _from_pure(getattr(like, f.name), data[f.name])
        return type(like)(**kwargs)
    if isinstance(like, dict):
        return {k: _from_pure(v, data[k]) for k, v in like.items()}
    if isinstance(like, (list, tuple)):
        return type(like)(_from_pure(v, d) for v, d in zip(like, data))
    if hasattr(like, "dtype") or isinstance(like, (int, float, bool)):
        return jnp.asarray(data)
    return data
