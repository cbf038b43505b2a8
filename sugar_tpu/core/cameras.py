"""Camera containers for the TPU SuGaR stack.

Replaces the reference's dual GS/PyTorch3D camera representation
(sugar_scene/cameras.py) with a single JAX pytree. A :class:`Camera` carries
the world-to-view and full projection matrices in row convention
(``p_cam = W2C @ p_h``); image size and FoV tangents are static metadata.

Batched cameras (``Cameras``) stack the array fields so a training loop can
``jax.lax.dynamic_index_in_dim`` / gather one camera per step under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.core import transforms as tf


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One pinhole camera. Array fields are leaves; sizes are static.

    Attributes:
      world_view: (4,4) world-to-camera, row convention.
      full_proj: (4,4) projection @ world_view.
      cam_center: (3,) camera position in world space.
      height, width: static image size in pixels.
      tan_half_fov_x, tan_half_fov_y: static FoV tangents.
    """

    world_view: jnp.ndarray
    full_proj: jnp.ndarray
    cam_center: jnp.ndarray
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    tan_half_fov_x: float = dataclasses.field(metadata=dict(static=True))
    tan_half_fov_y: float = dataclasses.field(metadata=dict(static=True))

    @property
    def focal_x(self) -> float:
        return self.width / (2.0 * self.tan_half_fov_x)

    @property
    def focal_y(self) -> float:
        return self.height / (2.0 * self.tan_half_fov_y)


def make_camera(
    R: np.ndarray,
    T: np.ndarray,
    fov_x: float,
    fov_y: float,
    height: int,
    width: int,
    znear: float = 0.01,
    zfar: float = 100.0,
    cx: float | None = None,
    cy: float | None = None,
) -> Camera:
    """Build a Camera from 3DGS-convention (R, T) + FoV.

    ``R`` is the cam-to-world rotation (stored transposed as in 3DGS), ``T``
    the world-to-cam translation; znear/zfar defaults match
    sugar_scene/cameras.py:142-223. (cx, cy) are pixel-space principal points
    (default: image center -> zero NDC offset).
    """
    w2v = tf.world_to_view(R, T)
    cx_ndc = 0.0 if cx is None else 2.0 * cx / width - 1.0
    cy_ndc = 0.0 if cy is None else 2.0 * cy / height - 1.0
    proj = tf.projection_matrix(znear, zfar, fov_x, fov_y, cx_ndc, cy_ndc)
    full = (proj @ w2v).astype(np.float32)
    cam_center = np.linalg.inv(w2v)[:3, 3].astype(np.float32)
    return Camera(
        world_view=jnp.asarray(w2v),
        full_proj=jnp.asarray(full),
        cam_center=jnp.asarray(cam_center),
        height=int(height),
        width=int(width),
        tan_half_fov_x=float(np.tan(fov_x / 2.0)),
        tan_half_fov_y=float(np.tan(fov_y / 2.0)),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Cameras:
    """A batch of same-resolution cameras (leading axis = camera index)."""

    world_view: jnp.ndarray  # (N, 4, 4)
    full_proj: jnp.ndarray  # (N, 4, 4)
    cam_center: jnp.ndarray  # (N, 3)
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    tan_half_fov_x: float = dataclasses.field(metadata=dict(static=True))
    tan_half_fov_y: float = dataclasses.field(metadata=dict(static=True))

    def __len__(self) -> int:
        return self.world_view.shape[0]

    def __getitem__(self, i: Any) -> Camera:
        return Camera(
            world_view=self.world_view[i],
            full_proj=self.full_proj[i],
            cam_center=self.cam_center[i],
            height=self.height,
            width=self.width,
            tan_half_fov_x=self.tan_half_fov_x,
            tan_half_fov_y=self.tan_half_fov_y,
        )

    @staticmethod
    def stack(cams: list[Camera]) -> "Cameras":
        c0 = cams[0]
        for c in cams:
            assert (c.height, c.width) == (c0.height, c0.width), (
                "Cameras.stack requires equal resolutions"
            )
        return Cameras(
            world_view=jnp.stack([c.world_view for c in cams]),
            full_proj=jnp.stack([c.full_proj for c in cams]),
            cam_center=jnp.stack([c.cam_center for c in cams]),
            height=c0.height,
            width=c0.width,
            tan_half_fov_x=c0.tan_half_fov_x,
            tan_half_fov_y=c0.tan_half_fov_y,
        )


def spatial_extent(cam_centers: jnp.ndarray) -> jnp.ndarray:
    """1.1 x max distance of camera centers to their mean — the reference's
    ``get_spatial_extent`` (sugar_scene/cameras.py:418-545) / nerf++ radius
    (dataset_readers.py:45-66)."""
    center = jnp.mean(cam_centers, axis=0, keepdims=True)
    dist = jnp.linalg.norm(cam_centers - center, axis=-1)
    return 1.1 * jnp.max(dist)
