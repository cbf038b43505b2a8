"""Host-side wrapper: binning output -> aligned dup-order gather -> Pallas.

Completes the production render path. Mosaic requires DMA slice offsets
along the lane dimension to be divisible by the tiling (128), so each tile's
duplication range is re-laid-out to start on a C_CHUNK boundary: a second
gather maps aligned slots back to the [tile|depth]-sorted order, padding
slots with opacity-0 entries (inert under the kernel's cutoff gates). The
pre-gather is differentiable — its transpose is the scatter-add that
reduces per-dup-slot gradients back onto Gaussians.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sugar_tpu.raster import common as rc
from sugar_tpu.raster.binning import Binning
from sugar_tpu.raster.pallas_composite import C_CHUNK, pack_dup, tile_composite
from sugar_tpu.raster.preprocess import Preprocessed


def render_pallas(
    prep: Preprocessed,
    binning: Binning,
    settings: rc.RasterSettings,
    max_per_tile: int = 8192,
) -> dict:
    tx_n, ty_n = settings.tiles_x, settings.tiles_y
    num_tiles = tx_n * ty_n
    ch = prep.color.shape[-1]
    max_chunks = max(1, (max_per_tile + C_CHUNK - 1) // C_CHUNK)

    capacity = binning.sorted_gauss.shape[0]
    count_clip = jnp.minimum(binning.tile_count, max_chunks * C_CHUNK)

    # ---- aligned re-layout: every tile range starts on a chunk boundary.
    aligned_counts = ((count_clip + C_CHUNK - 1) // C_CHUNK) * C_CHUNK
    aligned_start = jnp.cumsum(aligned_counts) - aligned_counts  # (T,)
    d_al = capacity + C_CHUNK * num_tiles  # static upper bound

    from sugar_tpu.raster.binning import bucketize_by_offsets

    s = jnp.arange(d_al, dtype=jnp.int32)
    t = jnp.clip(bucketize_by_offsets(aligned_start, d_al), 0, num_tiles - 1)
    local = s - aligned_start[t]
    total_aligned = aligned_start[-1] + aligned_counts[-1]
    valid = (local < count_clip[t]) & (s < total_aligned)
    src_slot = jnp.clip(binning.tile_start[t] + local, 0, capacity - 1)
    gid = jnp.where(valid, binning.sorted_gauss[src_slot], 0)

    # Differentiable pre-gather into one packed component-major array.
    dup_data = pack_dup(
        prep.mean2d[gid],
        prep.conic[gid],
        jnp.where(valid, prep.opacity[gid], 0.0),
        prep.color[gid],
    )  # (ROWS, D)
    slot_mask = valid.astype(jnp.float32)[None, :]

    shape_info = (tx_n, num_tiles, ch, max_chunks)
    img_t, final_t, n_contrib = tile_composite(
        shape_info,
        aligned_start,
        count_clip,
        slot_mask,
        dup_data,
        settings.bg,
    )

    def assemble(x, c):
        x = x.reshape(ty_n, tx_n, rc.TILE_Y, rc.TILE_X, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(ty_n * rc.TILE_Y, tx_n * rc.TILE_X, c)
        return x[: settings.image_height, : settings.image_width]

    image = assemble(img_t, ch)
    final_t = assemble(final_t[..., None], 1)[..., 0]
    n_contrib = assemble(n_contrib[..., None], 1)[..., 0]
    tile_overflow = jnp.maximum(jnp.max(binning.tile_count) - max_chunks * C_CHUNK, 0)
    return dict(
        image=image,
        final_T=final_t,
        n_contrib=n_contrib,
        tile_overflow=tile_overflow,
    )
