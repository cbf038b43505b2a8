"""Model-level rendering: GaussianModel + Camera -> image.

The TPU analog of gaussian_renderer/__init__.py:18-100 — builds raster
settings from the camera, applies activations, and exposes the screen-space
gradient probe used by densification.
"""

from __future__ import annotations

import jax.numpy as jnp

from sugar_tpu.core.cameras import Camera
from sugar_tpu.models.gaussians import GaussianModel, GaussianParams
from sugar_tpu.raster import common as rc
from sugar_tpu.raster.api import rasterize_gaussians
from sugar_tpu.core.quaternions import normalize as quat_normalize
import jax


def render_model(
    model: GaussianModel,
    camera: Camera,
    bg: jnp.ndarray | None = None,
    active_sh_degree: int | None = None,
    ndc_offset: jnp.ndarray | None = None,
    colors_override: jnp.ndarray | None = None,
    dup_capacity: int | None = None,
    k_max: int = 1024,
    mode: str = "auto",
    tile_cap: int | None = None,
    cap_a: int = 4,
    big_cap: int | None = None,
) -> dict:
    """Render one view of the model. ``colors_override`` bypasses SH (used
    for depth/feature rendering, the reference's point_colors trick).

    ``mode='auto'`` (default) renders through the fused Pallas production
    path on TPU and the pure-XLA tiled path elsewhere — the analog of the
    reference always rendering through its CUDA kernel
    (gaussian_renderer/__init__.py:18-100)."""
    import dataclasses

    if active_sh_degree is None:
        active_sh_degree = model.sh_degree
    settings = dataclasses.replace(
        rc.from_camera(camera, bg=bg), sh_degree=active_sh_degree
    )
    k = (active_sh_degree + 1) ** 2
    return rasterize_gaussians(
        model.params.xyz,
        model.opacities,
        settings,
        scales=model.scales,
        quaternions=model.quaternions,
        colors=colors_override,
        shs=None if colors_override is not None else model.sh[:, :, :k],
        alive_mask=model.alive,
        ndc_offset=ndc_offset,
        mode=mode,
        dup_capacity=dup_capacity,
        k_max=k_max,
        tile_cap=tile_cap,
        cap_a=cap_a,
        big_cap=big_cap,
    )


def render_params(
    params: GaussianParams,
    alive: jnp.ndarray,
    camera: Camera,
    active_sh_degree: int,
    bg: jnp.ndarray,
    ndc_offset: jnp.ndarray | None = None,
    dup_capacity: int | None = None,
    k_max: int = 1024,
    mode: str = "auto",
    tile_cap: int | None = None,
    cap_a: int = 4,
    big_cap: int | None = None,
) -> dict:
    """Differentiable path taking raw params explicitly (for jax.grad)."""
    settings = rc.from_camera(camera, bg=bg)
    import dataclasses

    settings = dataclasses.replace(settings, sh_degree=active_sh_degree)
    k = (active_sh_degree + 1) ** 2
    sh = jnp.concatenate([params.sh_dc[:, :, None], params.sh_rest], axis=-1)
    return rasterize_gaussians(
        params.xyz,
        jax.nn.sigmoid(params.opacity_logit),
        settings,
        scales=jnp.exp(params.log_scales),
        quaternions=quat_normalize(params.quaternions),
        shs=sh[:, :, :k],
        alive_mask=alive,
        ndc_offset=ndc_offset,
        mode=mode,
        dup_capacity=dup_capacity,
        k_max=k_max,
        tile_cap=tile_cap,
        cap_a=cap_a,
        big_cap=big_cap,
    )
