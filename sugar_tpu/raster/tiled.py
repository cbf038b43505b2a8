"""Tile-binned differentiable renderer (pure-JAX production path v1).

TPU recast of the CUDA renderCUDA kernel (forward.cu:261-374): the per-tile
front-to-back walk becomes, for a batch of tiles at once,

  gather (tile, k) gaussian slots -> (tiles, K, pix) alpha evaluation on the
  VPU -> log-space transmittance scan -> (pix, K) @ (K, C) color matmuls on
  the MXU,

with the early-stop/cutoff semantics delegated to raster.composite. Gradient
flows via JAX autodiff: the per-tile gathers transpose to scatter-adds, which
is the no-atomics TPU equivalent of the CUDA backward's atomicAdd
accumulation (backward.cu:509-554; SURVEY.md §7 hard part #2).

Each tile's Gaussian list is capped at a static ``k_max`` (depth-sorted, so
overflow drops the *farthest* Gaussians); `tile_overflow` reports the worst
tile so callers can re-jit with a bigger cap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sugar_tpu.raster import common as rc
from sugar_tpu.raster import composite as comp
from sugar_tpu.raster.binning import Binning
from sugar_tpu.raster.preprocess import Preprocessed


def render_tiled(
    prep: Preprocessed,
    binning: Binning,
    settings: rc.RasterSettings,
    k_max: int = 1024,
    tile_chunk: int = 64,
    compose_block: int = 128,
) -> dict:
    tx_n, ty_n = settings.tiles_x, settings.tiles_y
    num_tiles = tx_n * ty_n
    capacity = binning.sorted_gauss.shape[0]
    tile_pix = rc.TILE_X * rc.TILE_Y
    c = prep.color.shape[-1]

    # Per-tile pixel coordinates (CUDA pixf = integer pixel coords).
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_x = t_ids % tx_n
    tile_y = t_ids // tx_n
    py, px = jnp.meshgrid(
        jnp.arange(rc.TILE_Y, dtype=jnp.int32),
        jnp.arange(rc.TILE_X, dtype=jnp.int32),
        indexing="ij",
    )
    pix_all = jnp.stack(
        [
            tile_x[:, None] * rc.TILE_X + px.reshape(-1)[None, :],
            tile_y[:, None] * rc.TILE_Y + py.reshape(-1)[None, :],
        ],
        axis=-1,
    ).astype(jnp.float32)  # (T, tile_pix, 2)

    pad_tiles = (-num_tiles) % tile_chunk
    n_chunks = (num_tiles + pad_tiles) // tile_chunk

    start_p = jnp.pad(binning.tile_start, (0, pad_tiles))
    count_p = jnp.pad(binning.tile_count, (0, pad_tiles))
    pix_p = jnp.pad(pix_all, ((0, pad_tiles), (0, 0), (0, 0)))

    def render_tile(start, count, pix):
        slots = start + jnp.arange(k_max, dtype=jnp.int32)
        in_list = jnp.arange(k_max, dtype=jnp.int32) < count
        gid = binning.sorted_gauss[jnp.clip(slots, 0, capacity - 1)]
        alpha = comp.alpha_from_conic(
            prep.mean2d[gid], prep.conic[gid], prep.opacity[gid], pix, in_list
        )
        return comp.composite_depth_ordered(
            alpha, prep.color[gid], settings.bg, block=compose_block
        )

    def render_chunk(args):
        return jax.vmap(render_tile)(*args)

    img_t, final_t, n_contrib = jax.lax.map(
        render_chunk,
        (
            start_p.reshape(n_chunks, tile_chunk),
            count_p.reshape(n_chunks, tile_chunk),
            pix_p.reshape(n_chunks, tile_chunk, tile_pix, 2),
        ),
    )

    # (chunks, tile_chunk, pix, C) -> (Ty, Tx, TILE_Y, TILE_X, C) -> image.
    def assemble(x, ch):
        x = x.reshape(num_tiles + pad_tiles, tile_pix, ch)[:num_tiles]
        x = x.reshape(ty_n, tx_n, rc.TILE_Y, rc.TILE_X, ch)
        x = x.transpose(0, 2, 1, 3, 4).reshape(ty_n * rc.TILE_Y, tx_n * rc.TILE_X, ch)
        return x[: settings.image_height, : settings.image_width]

    image = assemble(img_t, c)
    final_t = assemble(final_t[..., None], 1)[..., 0]
    n_contrib = assemble(n_contrib[..., None], 1)[..., 0]
    tile_overflow = jnp.maximum(jnp.max(binning.tile_count) - k_max, 0)
    return dict(
        image=image,
        final_T=final_t,
        n_contrib=n_contrib,
        tile_overflow=tile_overflow,
    )
