"""Naive O(pixels x gaussians) reference renderer — the parity oracle.

Replicates the CUDA pipeline semantics exactly (including tile-rect
visibility granularity: a Gaussian contributes to a pixel iff the pixel's
16x16 tile intersects the Gaussian's bounding rect, forward.cu:276-282 +
auxiliary.h:46-56) without any binning. Used by tests as the ground truth for
the production tiled/Pallas paths, in the spirit of the python
`compute_cov3D_python`/`convert_SHs_python` cross-check paths of the
reference (gaussian_renderer/__init__.py:62-82).

Fully differentiable; slow by design. Keep scenes small.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sugar_tpu.raster import common as rc
from sugar_tpu.raster import composite as comp
from sugar_tpu.raster.preprocess import Preprocessed


def render_reference(
    prep: Preprocessed,
    settings: rc.RasterSettings,
    pixel_chunk: int = 2048,
) -> dict:
    """Render with a brute-force per-pixel loop over all Gaussians.

    Returns dict with image (H, W, C), final_T (H, W), n_contrib (H, W).
    """
    h, w = settings.image_height, settings.image_width
    n = prep.depth.shape[0]

    # Global stable depth sort == per-tile [tile|depth] CUDA order restricted
    # to each tile (ties keep duplication order = gaussian index order).
    alive = prep.tiles_touched > 0
    sort_depth = jnp.where(alive, prep.depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)
    mean2d = prep.mean2d[order]
    conic = prep.conic[order]
    opacity = prep.opacity[order]
    color = prep.color[order]
    rect_min = prep.rect_min[order]
    rect_max = prep.rect_max[order]
    valid = alive[order]

    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(jnp.float32)
    tiles = jnp.stack(
        [xs.reshape(-1) // rc.TILE_X, ys.reshape(-1) // rc.TILE_Y], axis=-1
    ).astype(jnp.int32)

    total = h * w
    pad = (-total) % pixel_chunk
    pix_p = jnp.pad(pix, ((0, pad), (0, 0)))
    tiles_p = jnp.pad(tiles, ((0, pad), (0, 0)))
    n_chunks = pix_p.shape[0] // pixel_chunk

    def render_chunk(args):
        pix_c, tile_c = args  # (P, 2)
        covered = (
            (tile_c[None, :, 0] >= rect_min[:, None, 0])
            & (tile_c[None, :, 0] < rect_max[:, None, 0])
            & (tile_c[None, :, 1] >= rect_min[:, None, 1])
            & (tile_c[None, :, 1] < rect_max[:, None, 1])
        )  # (N, P)
        alpha = comp.alpha_from_conic(mean2d, conic, opacity, pix_c, valid)
        alpha = jnp.where(covered, alpha, 0.0)
        return comp.composite_depth_ordered(alpha, color, settings.bg)

    img, final_t, n_contrib = jax.lax.map(
        render_chunk,
        (
            pix_p.reshape(n_chunks, pixel_chunk, 2),
            tiles_p.reshape(n_chunks, pixel_chunk, 2),
        ),
    )
    c = img.shape[-1]
    img = img.reshape(-1, c)[:total].reshape(h, w, c)
    final_t = final_t.reshape(-1)[:total].reshape(h, w)
    n_contrib = n_contrib.reshape(-1)[:total].reshape(h, w)
    return dict(image=img, final_T=final_t, n_contrib=n_contrib)
