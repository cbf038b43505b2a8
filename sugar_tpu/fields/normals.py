"""PCA point-cloud normal estimation.

TPU-native replacement for PyTorch3D's ``estimate_pointcloud_normals``
(used by SuGaR.get_normals(estimate_from_points=True),
sugar_model.py:946-961, for the Gaussian-centers mesh-extraction ablation,
coarse_mesh.py:499): for each point, the normal is the smallest-eigenvalue
eigenvector of its k-neighborhood covariance, with the PyTorch3D majority
disambiguation (flip when fewer than half the neighbor offsets lie in the
normal's positive halfspace).
"""

from __future__ import annotations

import jax.numpy as jnp

from sugar_tpu.fields.knn import knn


def estimate_pointcloud_normals(
    points: jnp.ndarray,  # (N, 3)
    neighborhood_size: int = 32,
    disambiguate_directions: bool = True,
    mask: jnp.ndarray | None = None,  # (N,) bool
) -> jnp.ndarray:
    """Returns unit normals (N, 3)."""
    k = neighborhood_size
    _, idx = knn(points, points, k=k, ref_mask=mask)
    nbrs = points[idx]  # (N, K, 3)
    ctr = jnp.mean(nbrs, axis=1, keepdims=True)
    d = nbrs - ctr
    cov = jnp.einsum("nki,nkj->nij", d, d) / k
    # eigh returns ascending eigenvalues; the first eigenvector spans the
    # direction of least variance = the surface normal.
    _, vecs = jnp.linalg.eigh(cov)
    normals = vecs[..., 0]
    if disambiguate_directions:
        off = nbrs - points[:, None, :]
        proj = jnp.sum(normals[:, None, :] * off, axis=-1)
        n_pos = jnp.sum((proj > 0).astype(jnp.int32), axis=1)
        flip = n_pos < 0.5 * k
        normals = jnp.where(flip[:, None], -normals, normals)
    return normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
    )
