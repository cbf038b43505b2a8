"""Gaussian-neighborhood regularizers: overlap and alignment.

Pure-JAX versions of SuGaR.compute_gaussian_overlap_with_neighbors
(sugar_model.py:1048-1114) and compute_gaussian_alignment_with_neighbors
(:1116-1170). Defined-but-unused by the default trainers in the reference as
well; exposed for experimentation parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sugar_tpu.core.quaternions import quaternion_apply, quaternion_invert
from sugar_tpu.fields.density import GaussianFieldParams, smallest_axes


def gaussian_overlap_with_neighbors(
    gp: GaussianFieldParams,
    neighbor_idx: jnp.ndarray,  # (M, K) — column 0 is the point itself
    rng: jax.Array | None = None,
    use_gaussian_center_only: bool = True,
    n_samples: int = 32,
    weight_by_normal_angle: bool = False,
    propagate_gradient_to_points_only: bool = False,
) -> jnp.ndarray:
    """Mean Gaussian weight of each point's samples under its K-1 neighbor
    Gaussians. Returns (M, K-1)."""
    scales = gp.scales
    quats = gp.quaternions
    if propagate_gradient_to_points_only:
        scales = jax.lax.stop_gradient(scales)
        quats = jax.lax.stop_gradient(quats)

    pt_idx = neighbor_idx[:, 0]
    m = pt_idx.shape[0]
    if use_gaussian_center_only:
        samples = gp.centers[pt_idx][:, None, :]  # (M, 1, 3)
    else:
        assert rng is not None
        noise = jax.random.normal(rng, (m, n_samples, 3))
        samples = gp.centers[pt_idx][:, None, :] + quaternion_apply(
            quats[pt_idx][:, None, :], scales[pt_idx][:, None, :] * noise
        )

    nb = neighbor_idx[:, 1:]  # (M, K-1)
    shift = samples[:, None] - gp.centers[nb][:, :, None]  # (M, K-1, S, 3)
    inv_s = 1.0 / scales[nb][:, :, None]  # (M, K-1, 1, 3)
    gd = inv_s * quaternion_apply(quaternion_invert(quats[nb])[:, :, None], shift)
    weights = jnp.exp(-0.5 * jnp.sum(gd * gd, axis=-1))  # (M, K-1, S)
    overlaps = jnp.mean(weights, axis=-1)

    if weight_by_normal_angle:
        normals = smallest_axes(gp.scales, gp.quaternions)[neighbor_idx]
        w = jnp.abs(jnp.sum(normals[:, 1:] * normals[:, 0:1], axis=-1))
        overlaps = overlaps * w
    return overlaps


def gaussian_alignment_with_neighbors(
    gp: GaussianFieldParams,
    neighbor_idx: jnp.ndarray,  # (M, K)
    std_factor: float = 1.0,
    weight_by_normal_angle: bool = False,
    propagate_gradient_to_points_only: bool = False,
) -> jnp.ndarray:
    """|distance / (sigma_i + sigma_j) - 1| per neighbor pair. (M, K-1)."""
    scales = gp.scales
    quats = gp.quaternions
    if propagate_gradient_to_points_only:
        scales = jax.lax.stop_gradient(scales)
        quats = jax.lax.stop_gradient(quats)

    all_s = scales[neighbor_idx]  # (M, K, 3)
    all_qi = quaternion_invert(quats)[neighbor_idx]
    all_c = gp.centers[neighbor_idx]

    shifts = all_c[:, 1:] - all_c[:, :1]
    dists = jnp.maximum(jnp.linalg.norm(shifts, axis=-1), 1e-8)
    dirs = shifts / dists[..., None]

    std_self = jnp.linalg.norm(
        all_s[:, :1] * quaternion_apply(all_qi[:, :1], dirs), axis=-1
    )
    std_nb = jnp.linalg.norm(
        all_s[:, 1:] * quaternion_apply(all_qi[:, 1:], dirs), axis=-1
    )
    stab = jnp.maximum((std_self + std_nb) * std_factor, 1e-8)
    alignment = jnp.abs(dists / stab - 1.0)

    if weight_by_normal_angle:
        normals = smallest_axes(gp.scales, gp.quaternions)[neighbor_idx]
        w = jnp.abs(jnp.sum(normals[:, 1:] * normals[:, 0:1], axis=-1))
        alignment = alignment * w
    return alignment
