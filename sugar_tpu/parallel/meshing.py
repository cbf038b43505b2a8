"""Multi-chip level-set point collection for coarse mesh extraction.

The reference accumulates the 10M-point level-set cloud one camera at a
time on a single GPU (sugar_extractors/coarse_mesh.py:230-327). The loop is
embarrassingly data-parallel over cameras, so here batches of ``n_devices``
cameras run concurrently: the camera batch is sharded over one mesh axis
(Gaussian buffers replicated), each device computes its own camera's depth
render + KNN + ray sampling + density evaluation, and the host concatenates
the per-camera results in the original camera order. The per-camera
subsampling RNG is consumed in camera order on the host, so the collected
cloud is IDENTICAL to the single-device ``collect_surface_points`` for any
device count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sugar_tpu.core.cameras import Camera, Cameras
from sugar_tpu.meshing.levelset import level_surface_points_one_camera
from sugar_tpu.models.gaussians import GaussianModel


def collect_surface_points_sharded(
    mesh: Mesh,
    axis: str,
    model: GaussianModel,
    cameras: list[Camera],
    surface_level: float = 0.3,
    total_points: int = 10_000_000,
    rng: np.random.Generator | None = None,
    dup_capacity: int = 2**22,
    k_max: int = 1024,
    colors_per_gaussian: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """Sharded drop-in for meshing.levelset.collect_surface_points."""
    rng = rng or np.random.default_rng(0)
    n_dev = mesh.shape[axis]
    per_cam = total_points // max(len(cameras), 1)
    data = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, static_argnames=())
    def batch_fn(params, alive, cams):
        return jax.vmap(
            lambda cam: level_surface_points_one_camera(
                params, alive, cam,
                surface_level=surface_level,
                dup_capacity=dup_capacity, k_max=k_max,
            )
        )(cams)

    params = jax.device_put(model.params, repl)
    alive = jax.device_put(model.alive, repl)

    pts, nrm, gid, cols = [], [], [], []
    for b0 in range(0, len(cameras), n_dev):
        group = cameras[b0 : b0 + n_dev]
        n_real = len(group)
        # Pad the last group (results discarded) so the batch stays sharded.
        group = group + [group[-1]] * (n_dev - n_real)
        cams_b = jax.tree.map(
            lambda x: jax.device_put(x, data), Cameras.stack(group)
        )
        out = jax.tree.map(np.asarray, batch_fn(params, alive, cams_b))
        for i in range(n_real):
            valid = out["valid"][i]
            idx = np.nonzero(valid)[0]
            if len(idx) > per_cam:
                idx = rng.choice(idx, size=per_cam, replace=False)
            pts.append(out["points"][i][idx])
            nrm.append(out["normals"][i][idx])
            g = out["gaussian_idx"][i][idx]
            gid.append(g)
            if colors_per_gaussian is not None:
                cols.append(colors_per_gaussian[g])
    return dict(
        points=np.concatenate(pts) if pts else np.zeros((0, 3), np.float32),
        normals=np.concatenate(nrm) if nrm else np.zeros((0, 3), np.float32),
        gaussian_idx=np.concatenate(gid) if gid else np.zeros((0,), np.int64),
        colors=np.concatenate(cols) if cols else None,
    )
