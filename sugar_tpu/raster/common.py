"""Shared constants and settings for the differentiable Gaussian rasterizer.

The numerical constants are part of the gradient semantics and must match the
reference CUDA kernel exactly (SURVEY.md §7 "hard parts" #6):

- ``ALPHA_CLAMP``  — per-sample alpha ceiling 0.99 (forward.cu:253).
- ``ALPHA_CUTOFF`` — samples with alpha < 1/255 are skipped (forward.cu:254).
- ``T_EPS``        — a pixel stops compositing when its transmittance would
  drop below 1e-4 (forward.cu:256-261).
- ``LOWPASS``      — +0.3 px² screen-space low-pass on cov2D diagonals
  (forward.cu:110-112).
- ``Z_CULL``       — near-cull at view z <= 0.2 (auxiliary.h:154).
- ``RADIUS_SIGMA`` — bounding radius = ceil(3 * sqrt(max eigenvalue))
  (forward.cu:229-232).
- ``FOV_CLAMP``    — EWA Jacobian input clamped to 1.3 * tan(fov/2)
  (forward.cu:82-87).

Tile size: the CUDA kernel uses 16x16 (config.h:15-17); on TPU we default to
16x16 as well for binning-granularity parity, but the compositing kernels
reshape a tile's pixels to VPU-friendly (rows, 128)-lane layouts internally.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

ALPHA_CLAMP = 0.99
ALPHA_CUTOFF = 1.0 / 255.0
T_EPS = 1e-4
LOWPASS = 0.3
Z_CULL = 0.2
RADIUS_SIGMA = 3.0
FOV_CLAMP = 1.3
W_EPS = 1e-7  # added to homogeneous w before divide (forward.cu:197-199)

TILE_X = 16
TILE_Y = 16


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RasterSettings:
    """Static + array settings for one rasterization call.

    Mirrors GaussianRasterizationSettings
    (diff_gaussian_rasterization/__init__.py:157-172) minus torch-isms.
    Array fields (viewmatrix, projmatrix, campos, bg) are traced; the rest
    are static.
    """

    viewmatrix: jnp.ndarray  # (4,4) world-to-cam, row convention
    projmatrix: jnp.ndarray  # (4,4) full projection = P @ W2C, row convention
    campos: jnp.ndarray  # (3,)
    bg: jnp.ndarray  # (C,) background color
    image_height: int = dataclasses.field(metadata=dict(static=True))
    image_width: int = dataclasses.field(metadata=dict(static=True))
    tanfovx: float = dataclasses.field(metadata=dict(static=True))
    tanfovy: float = dataclasses.field(metadata=dict(static=True))
    sh_degree: int = dataclasses.field(metadata=dict(static=True), default=0)
    scale_modifier: float = dataclasses.field(metadata=dict(static=True), default=1.0)

    @property
    def focal_x(self) -> float:
        return self.image_width / (2.0 * self.tanfovx)

    @property
    def focal_y(self) -> float:
        return self.image_height / (2.0 * self.tanfovy)

    @property
    def tiles_x(self) -> int:
        return (self.image_width + TILE_X - 1) // TILE_X

    @property
    def tiles_y(self) -> int:
        return (self.image_height + TILE_Y - 1) // TILE_Y


def from_camera(camera, bg=None) -> RasterSettings:
    """Build RasterSettings from a core.cameras.Camera."""
    if bg is None:
        bg = jnp.zeros((3,), dtype=jnp.float32)
    return RasterSettings(
        viewmatrix=camera.world_view,
        projmatrix=camera.full_proj,
        campos=camera.cam_center,
        bg=bg,
        image_height=camera.height,
        image_width=camera.width,
        tanfovx=camera.tan_half_fov_x,
        tanfovy=camera.tan_half_fov_y,
    )
