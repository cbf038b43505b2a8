"""Gaussian density / SDF field evaluation and in-Gaussian point sampling.

Pure-JAX recast of the reference field machinery:

- :func:`field_values` == SuGaR.get_field_values (sugar_model.py:1247-1316):
  density(x) = sum over the K nearest Gaussians of
  opacity_j * exp(-1/2 ||S_j^-1 R_j^T (x - mu_j)||^2), soft-clamped at 1;
  sdf(x) = beta * (sqrt(-2 ln d) - sqrt(-2 ln level));
  analytic sdf gradient, clamped to +-10.
- :func:`beta_field` == SuGaR.get_beta (sugar_model.py:1172-1245) modes
  'average' and 'weighted_average' ('learnable' is a scalar parameter the
  trainers own).
- :func:`sample_points_in_gaussians` == sugar_model.py:885-928.

Everything is chunk-streamed with lax.map so million-point queries stay
within HBM (the reference streams 2M-point passes, sugar_model.py:1521).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sugar_tpu.core.quaternions import quaternion_apply, quaternion_to_matrix


class GaussianFieldParams(NamedTuple):
    """Activated per-Gaussian quantities needed for field queries."""

    centers: jnp.ndarray  # (N, 3)
    scales: jnp.ndarray  # (N, 3)
    quaternions: jnp.ndarray  # (N, 4) unit
    opacities: jnp.ndarray  # (N,)


def inv_scaled_rotation(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """R diag(1/s): sqrt of the inverse-scale covariance
    (sugar_model.py:730-750 get_covariance(return_sqrt, inverse_scales))."""
    R = quaternion_to_matrix(quats)
    return R * (1.0 / jnp.maximum(scales, 1e-8))[:, None, :]


def field_values(
    x: jnp.ndarray,  # (M, 3) query points
    neighbor_idx: jnp.ndarray,  # (M, K) gaussian indices per query
    gp: GaussianFieldParams,
    density_factor: float = 1.0,
    density_threshold: float = 1.0,
    return_sdf: bool = True,
    return_sdf_grad: bool = False,
    sdf_grad_max_value: float = 10.0,
    beta_mode: str = "average",
    learnable_beta: jnp.ndarray | None = None,
    opacity_min_clamp: float = 1e-16,
    chunk: int = 65536,
) -> dict:
    """Evaluate density / sdf / beta fields at x. Differentiable."""
    isr = inv_scaled_rotation(gp.scales, gp.quaternions)  # (N, 3, 3)
    min_scale = jnp.min(gp.scales, axis=-1)  # (N,)
    global_max_min_scale = jnp.max(min_scale)
    # Component-major tables for the per-neighbor gathers: a (C*K, 3, 3)
    # row gather pads 3 -> 128 lanes on TPU (observed 57x HBM expansion —
    # a 288 MB gather OOM'd at 16 GB); gathering (rows, C*K) columns is
    # pad-free, and rows are ~free in the column-gather cost model
    # (PERF.md).
    isr9 = isr.reshape(-1, 9).T  # (9, N): row 3*i+j = isr[:, i, j]
    cen3 = gp.centers.T  # (3, N)

    def eval_chunk(args):
        xc, idx = args  # (C, 3), (C, K)
        c_n, k_n = idx.shape
        flat = idx.reshape(-1)  # (C*K,)
        m = isr9[:, flat]  # (9, C*K)
        cen = cen3[:, flat]  # (3, C*K)
        op = gp.opacities[flat]  # (C*K,)
        # x repeated K times along the flat neighbor axis.
        xT = xc.T[:, jnp.repeat(jnp.arange(c_n, dtype=jnp.int32), k_n)]
        shift = xT - cen  # (3, C*K)
        # warped_j = sum_i isr[i, j] * shift_i (diag(1/s) R^T shift).
        warped = jnp.stack(
            [
                m[0] * shift[0] + m[3] * shift[1] + m[6] * shift[2],
                m[1] * shift[0] + m[4] * shift[1] + m[7] * shift[2],
                m[2] * shift[0] + m[5] * shift[1] + m[8] * shift[2],
            ]
        )  # (3, C*K)
        quad = jnp.clip(jnp.sum(warped * warped, axis=0), 0.0, 1e8)
        neigh_op = (density_factor * op * jnp.exp(-0.5 * quad)).reshape(
            c_n, k_n
        )  # (C, K)
        density_raw = jnp.sum(neigh_op, axis=-1)  # (C,)
        # Soft clamp at 1 with pass-through gradient (sugar_model.py:1282-1284).
        density = jnp.where(
            density_raw >= 1.0,
            density_raw / (jax.lax.stop_gradient(density_raw) + 1e-12),
            density_raw,
        )
        out = dict(density=density_raw)

        if return_sdf or return_sdf_grad:
            if beta_mode == "learnable":
                beta = jnp.exp(learnable_beta) * jnp.ones_like(density)
            elif beta_mode == "average":
                beta = jnp.mean(min_scale[idx], axis=-1)
            elif beta_mode == "weighted_average":
                op_sum = jnp.sum(neigh_op, axis=-1, keepdims=True)
                weights = neigh_op / jnp.maximum(op_sum, opacity_min_clamp)
                beta = jnp.sum(min_scale[idx] * weights, axis=-1)
                beta = jnp.where(
                    op_sum[..., 0] == 0.0,
                    jax.lax.stop_gradient(global_max_min_scale),
                    beta,
                )
            else:
                raise ValueError(beta_mode)
            out["beta"] = beta
            # Upper clamp keeps sqrt(-2 ln d) differentiable at the density
            # ceiling (the reference's d/detach(d) trick evaluates to exactly
            # 1 there, where the sqrt's gradient blows up; 1e-7 below keeps
            # gradients finite with negligible value change).
            d_cl = jnp.clip(density, opacity_min_clamp, 1.0 - 1e-7)
            sqrt_term = jnp.sqrt(jnp.maximum(-2.0 * jnp.log(d_cl), 0.0))

        if return_sdf:
            level_term = jnp.sqrt(-2.0 * jnp.log(min(density_threshold, 1.0))) if density_threshold < 1.0 else 0.0
            out["sdf"] = beta * (sqrt_term - level_term)

        if return_sdf_grad:
            # sum_j o_j e^{-q/2} Sigma_j^{-1} (x - mu_j), scaled
            # (sugar_model.py:1310-1314). sigma_inv_shift_i =
            # sum_j isr[i, j] * warped_j, component-major like above.
            sis = jnp.stack(
                [
                    m[0] * warped[0] + m[1] * warped[1] + m[2] * warped[2],
                    m[3] * warped[0] + m[4] * warped[1] + m[5] * warped[2],
                    m[6] * warped[0] + m[7] * warped[1] + m[8] * warped[2],
                ]
            )  # (3, C*K)
            nf = neigh_op.reshape(-1)  # (C*K,)
            grad = jnp.sum(
                (nf * sis).reshape(3, c_n, k_n), axis=-1
            ).T  # (C, 3)
            denom = jnp.maximum(d_cl * sqrt_term, opacity_min_clamp)
            grad = (beta / denom)[..., None] * grad
            out["sdf_grad"] = jnp.clip(grad, -sdf_grad_max_value, sdf_grad_max_value)
        return out

    m = x.shape[0]
    pad = (-m) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    ip = jnp.pad(neighbor_idx, ((0, pad), (0, 0)))
    n_chunks = xp.shape[0] // chunk
    res = jax.lax.map(
        eval_chunk,
        (xp.reshape(n_chunks, chunk, 3), ip.reshape(n_chunks, chunk, -1)),
    )
    return {k: v.reshape((-1,) + v.shape[2:])[:m] for k, v in res.items()}


def sample_points_in_gaussians(
    rng: jax.Array,
    num_samples: int,
    gp: GaussianFieldParams,
    alive: jnp.ndarray,  # (N,) bool
    sampling_scale_factor: float = 1.0,
    prob_proportional_to_volume: bool = True,
    prob_proportional_to_opacity: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample points from the Gaussian mixture (sugar_model.py:885-928).

    Returns (points (S, 3), gaussian_idx (S,)).
    """
    if prob_proportional_to_volume:
        areas = gp.scales[:, 0] * gp.scales[:, 1] * gp.scales[:, 2]
    else:
        areas = jnp.ones_like(gp.scales[:, 0])
    if prob_proportional_to_opacity:
        areas = areas * gp.opacities
    areas = jnp.where(alive, jnp.abs(areas), 0.0)
    probs = areas / jnp.maximum(jnp.sum(areas), 1e-30)

    rng_idx, rng_noise = jax.random.split(rng)
    idx = jax.random.categorical(
        rng_idx, jnp.log(jnp.maximum(probs, 1e-37)), shape=(num_samples,)
    )
    noise = jax.random.normal(rng_noise, (num_samples, 3))
    local = sampling_scale_factor * gp.scales[idx] * noise
    pts = gp.centers[idx] + quaternion_apply(gp.quaternions[idx], local)
    return pts, idx


def smallest_axes(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """Unit normal direction of each Gaussian = rotation column of the
    smallest scale (sugar_model.py:930-946 get_smallest_axis)."""
    R = quaternion_to_matrix(quats)  # columns are principal axes
    k = jnp.argmin(scales, axis=-1)
    return jnp.take_along_axis(R, k[:, None, None], axis=2)[..., 0]


def local_variance(values: jnp.ndarray, neighbor_idx: jnp.ndarray) -> jnp.ndarray:
    """Variance of values over each neighborhood (sugar_model.py:977-986)."""
    nv = values[neighbor_idx]  # (M, K, D)
    return jnp.mean(
        jnp.sum((nv - jnp.mean(nv, axis=1, keepdims=True)) ** 2, axis=-1), axis=1
    )


@functools.partial(jax.jit, static_argnames=())
def depth_lookup_bilinear(
    depth: jnp.ndarray,  # (H, W)
    pix_xy: jnp.ndarray,  # (M, 2) float pixel coords
) -> jnp.ndarray:
    """Bilinear depth-map lookup with border padding — replaces the
    grid_sample call of get_points_depth_in_depth_map
    (sugar_model.py:1318-1333)."""
    h, w = depth.shape
    x = jnp.clip(pix_xy[:, 0], 0.0, w - 1.0)
    y = jnp.clip(pix_xy[:, 1], 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0
    fy = y - y0
    d00 = depth[y0, x0]
    d01 = depth[y0, x1]
    d10 = depth[y1, x0]
    d11 = depth[y1, x1]
    return (
        d00 * (1 - fx) * (1 - fy)
        + d01 * fx * (1 - fy)
        + d10 * (1 - fx) * fy
        + d11 * fx * fy
    )
