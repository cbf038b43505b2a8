"""Camera/world transforms and projection matrices (row convention).

Matches reference semantics (sugar_utils/graphics_utils.py:38-91) but uses a
single consistent row convention throughout: ``p_cam = W2C @ p_world_h``,
``p_clip = PROJ @ p_cam_h`` — no transposed/glm-style matrices. The
principal-point correction of sugar_scene/sugar_model.py:2157-2159 is folded
into :func:`projection_matrix` via (cx, cy).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fov2focal(fov, pixels):
    return pixels / (2.0 * np.tan(fov / 2.0))


def focal2fov(focal, pixels):
    return 2.0 * np.arctan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """COLMAP-style (R, t) -> 4x4 world-to-camera matrix.

    Following the 3DGS storage convention (graphics_utils.py:38-49): ``R`` is
    the *transposed* world-to-cam rotation (i.e. cam-to-world rotation) and
    ``t`` is the world-to-cam translation, so W2C = [[R^T, t], [0, 1]].
    """
    Rt = np.zeros((4, 4), dtype=np.float32)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = np.asarray(t)
    Rt[3, 3] = 1.0
    return Rt


def projection_matrix(
    znear: float,
    zfar: float,
    fov_x: float,
    fov_y: float,
    cx_ndc: float = 0.0,
    cy_ndc: float = 0.0,
) -> np.ndarray:
    """OpenGL-free GS projection matrix (row convention), z_sign = +1.

    ``cx_ndc``/``cy_ndc`` are principal-point offsets in GS NDC units:
    for a pixel-space principal point (cx, cy), pass ``2*cx/W - 1`` and
    ``2*cy/H - 1`` (0 for a centered camera). This reproduces the reference's
    ``proj_transform[2,0] = -K[0,0,2]`` fix (sugar_model.py:2157-2159).
    """
    tan_half_fov_y = np.tan(fov_y / 2.0)
    tan_half_fov_x = np.tan(fov_x / 2.0)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_half_fov_x
    P[1, 1] = 1.0 / tan_half_fov_y
    P[0, 2] = cx_ndc
    P[1, 2] = cy_ndc
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def ndc_to_pix(ndc, size):
    """GS NDC [-1,1] -> pixel coordinate (auxiliary.h ndc2Pix)."""
    return ((ndc + 1.0) * size - 1.0) * 0.5


def transform_points_h(matrix: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 matrix to (..., 3) points, returning (..., 4) homogeneous."""
    return points @ matrix[:, :3].T + matrix[:, 3]


def transform_points(matrix: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid 4x4 matrix to (..., 3) points, returning (..., 3)."""
    return points @ matrix[:3, :3].T + matrix[:3, 3]
