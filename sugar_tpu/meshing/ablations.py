"""Mesh-extraction ablation paths from the reference extractor.

coarse_mesh.py keeps two alternative extraction strategies next to the main
level-set+Poisson path; both are reproduced here:

- :func:`extract_mesh_from_gaussian_centers` (coarse_mesh.py:491-622):
  Poisson directly on the Gaussian centers with smallest-axis normals
  (flipped toward the closest camera).
- :func:`extract_mesh_with_marching_cubes` (coarse_mesh.py:623-757):
  density field evaluated on a regular grid, iso-surface at the surface
  level (surface nets stand in for PyMCubes; same watertight output class).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from sugar_tpu.core.cameras import Camera
from sugar_tpu.fields import density as df
from sugar_tpu.fields.knn import knn
from sugar_tpu.meshing import meshops
from sugar_tpu.meshing.poisson import poisson_reconstruct, remove_low_density_vertices, surface_nets
from sugar_tpu.models.gaussians import GaussianModel


def _field_params(model: GaussianModel) -> df.GaussianFieldParams:
    import jax

    return df.GaussianFieldParams(
        centers=model.params.xyz,
        scales=model.scales,
        quaternions=model.quaternions,
        opacities=jax.nn.sigmoid(model.params.opacity_logit),
    )


def extract_mesh_from_gaussian_centers(
    model: GaussianModel,
    cameras: list[Camera],
    poisson_resolution: int = 192,
    decimation_target: int = 200_000,
    density_quantile: float = 0.1,
    neighborhood_size: int = 32,
) -> tuple[np.ndarray, np.ndarray]:
    """Poisson over the Gaussian centers with PCA-estimated normals
    (get_normals(estimate_from_points=True), sugar_model.py:956-961)."""
    from sugar_tpu.fields.normals import estimate_pointcloud_normals

    alive = np.asarray(model.alive)
    centers = np.asarray(model.params.xyz)[alive]
    normals = np.asarray(
        estimate_pointcloud_normals(
            jnp.asarray(centers),
            neighborhood_size=min(neighborhood_size, max(len(centers), 1)),
            disambiguate_directions=True,
        )
    )

    centers, (normals,) = meshops.remove_statistical_outliers(centers, [normals])
    res = poisson_reconstruct(centers, normals, resolution=poisson_resolution)
    v, f = remove_low_density_vertices(res, density_quantile)
    v, f = meshops.decimate(v, f, decimation_target)
    return meshops.clean_mesh(v, f)


def extract_mesh_with_marching_cubes(
    model: GaussianModel,
    surface_level: float = 0.5,
    resolution: int = 256,
    knn_neighbors: int = 16,
    padding: float = 0.05,
    decimation_target: int | None = None,
    chunk: int = 2**17,
) -> tuple[np.ndarray, np.ndarray]:
    """Iso-surface of the density field on a regular grid."""
    import jax

    gp = _field_params(model)
    alive = np.asarray(model.alive)
    pts = np.asarray(model.params.xyz)[alive]
    lo, hi = pts.min(0), pts.max(0)
    span = (hi - lo).max()
    c = (hi + lo) / 2
    half = span * (0.5 + padding)
    origin = c - half
    scale = 2 * half / (resolution - 1)

    axes = [np.arange(resolution) * scale + origin[i] for i in range(3)]
    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    grid_pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)

    dens = np.empty(len(grid_pts), np.float32)
    for i in range(0, len(grid_pts), chunk):
        q = jnp.asarray(grid_pts[i : i + chunk])
        _, idx = knn(q, model.params.xyz, k=knn_neighbors, ref_mask=model.alive)
        out = df.field_values(q, idx, gp, return_sdf=False, chunk=min(chunk, 65536))
        dens[i : i + chunk] = np.asarray(jnp.minimum(out["density"], 1.0))
    field = dens.reshape(resolution, resolution, resolution)

    verts_g, faces = surface_nets(field, surface_level)
    verts = verts_g * scale + origin
    if decimation_target:
        verts, faces = meshops.decimate(verts, faces, decimation_target)
    return meshops.clean_mesh(verts.astype(np.float32), faces)
