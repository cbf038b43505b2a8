"""Scene composition: render multiple Gaussian sets in one pass.

Reference: SuGaRCompositor (sugar_scene/sugar_compositor.py:12-245) —
concatenates several (possibly edited/animated) SuGaR models, optionally
sub-selecting Gaussians, and renders them through a single rasterizer call
so occlusion between scenes is resolved correctly. Consumes rigid/per-frame
transforms such as those produced by the Blender export scripts
(blender/*.py).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from sugar_tpu.core.cameras import Camera
from sugar_tpu.core.quaternions import (
    matrix_to_quaternion,
    quaternion_raw_multiply,
)
from sugar_tpu.raster import common as rcm
from sugar_tpu.raster.api import rasterize_gaussians


@dataclasses.dataclass
class GaussianSet:
    """One renderable component: activated gaussian arrays + optional rigid
    transform (R (3,3), t (3,)) applied at composite time."""

    centers: jnp.ndarray
    scales: jnp.ndarray
    quaternions: jnp.ndarray
    opacities: jnp.ndarray
    colors: jnp.ndarray  # (N, 3) precomputed RGB (viewer-style)
    transform_R: jnp.ndarray | None = None
    transform_t: jnp.ndarray | None = None
    mask: jnp.ndarray | None = None  # bool subset (idx_to_render analog)


def composite_render(
    sets: Sequence[GaussianSet],
    camera: Camera,
    bg: jnp.ndarray | None = None,
    dup_capacity: int | None = None,
    k_max: int = 1024,
) -> dict:
    """Concatenate all sets (with transforms applied) and render once."""
    centers, scales, quats, opac, colors, alive = [], [], [], [], [], []
    for s in sets:
        c = s.centers
        q = s.quaternions
        if s.transform_R is not None:
            c = c @ s.transform_R.T + (
                s.transform_t if s.transform_t is not None else 0.0
            )
            qr = matrix_to_quaternion(s.transform_R[None])[0]
            q = quaternion_raw_multiply(qr[None, :], q)
        centers.append(c)
        scales.append(s.scales)
        quats.append(q)
        opac.append(s.opacities)
        colors.append(s.colors)
        alive.append(
            s.mask
            if s.mask is not None
            else jnp.ones(c.shape[0], bool)
        )
    centers = jnp.concatenate(centers)
    n = centers.shape[0]
    if dup_capacity is None:
        dup_capacity = 8 * n
    settings = rcm.from_camera(camera, bg=bg)
    return rasterize_gaussians(
        centers,
        jnp.concatenate(opac),
        settings,
        scales=jnp.concatenate(scales),
        quaternions=jnp.concatenate(quats),
        colors=jnp.concatenate(colors),
        alive_mask=jnp.concatenate(alive),
        mode="tiled",
        dup_capacity=dup_capacity,
        k_max=k_max,
    )
