"""Quaternion utilities (wxyz convention), replacing PyTorch3D transforms.

Conventions match the reference stack: quaternions are (w, x, y, z); the
rotation matrix layout matches 3DGS ``build_rotation``
(gaussian_splatting/utils/general_utils.py) and PyTorch3D
``quaternion_to_matrix`` — both produce the same matrix for unit quaternions.

All functions are pure JAX, batched over leading dims, differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions to unit norm."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3).

    Same layout as 3DGS build_rotation: row i of R is the image of basis
    vector e_i under... (R @ v rotates v by q).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branchless: computes all four candidate quaternions (scaled by their
    pivot) and selects the one with the largest pivot, which is numerically
    stable everywhere on SO(3).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidates q_abs^2 = (1 + diag combos) / 4, times 4*pivot each.
    qw2 = jnp.maximum(0.0, 1.0 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    # Candidate quaternions, each scaled by 4 * pivot component.
    cand_w = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cand_x = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cand_y = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cand_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    pivots = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)  # (..., 4)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (...,4,4)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    return normalize(q)


def quaternion_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b (wxyz), no normalization."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_invert(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a unit quaternion = conjugate."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quaternion_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate points v (..., 3) by unit quaternions q (..., 4)."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    out = quaternion_raw_multiply(quaternion_raw_multiply(q, qv), quaternion_invert(q))
    return out[..., 1:]
