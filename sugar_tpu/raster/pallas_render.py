"""Host-side wrapper: binning output -> dup-order gather -> Pallas kernel.

Completes the production render path: the differentiable pre-gather puts
per-Gaussian screen-space data into duplication order (its autodiff
transpose is the scatter-add that reduces per-dup-slot gradients back onto
Gaussians), the Pallas kernel composites per tile, and the tile outputs are
assembled into the image exactly like raster.tiled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sugar_tpu.raster import common as rc
from sugar_tpu.raster.binning import Binning
from sugar_tpu.raster.pallas_composite import C_CHUNK, tile_composite
from sugar_tpu.raster.preprocess import Preprocessed


def render_pallas(
    prep: Preprocessed,
    binning: Binning,
    settings: rc.RasterSettings,
    max_per_tile: int = 8192,
    interpret: bool = False,
) -> dict:
    del interpret  # (interpret mode is selected globally via pltpu helpers)
    tx_n, ty_n = settings.tiles_x, settings.tiles_y
    num_tiles = tx_n * ty_n
    ch = prep.color.shape[-1]
    max_chunks = max(1, (max_per_tile + C_CHUNK - 1) // C_CHUNK)

    capacity = binning.sorted_gauss.shape[0]
    gid = binning.sorted_gauss
    # Differentiable pre-gather into component-major dup order (comp, D);
    # padded by one chunk so the kernel's fixed-size DMAs never run off the
    # end. The lane axis is the dup axis — chunk DMAs stay 128-aligned.
    pad = C_CHUNK
    dup_mean = jnp.pad(prep.mean2d[gid].T, ((0, 0), (0, pad)))
    dup_conic = jnp.pad(prep.conic[gid].T, ((0, 0), (0, pad)))
    dup_opac = jnp.pad(prep.opacity[gid][None, :], ((0, 0), (0, pad)))
    dup_color = jnp.pad(prep.color[gid].T, ((0, 0), (0, pad)))

    count_clip = jnp.minimum(binning.tile_count, max_chunks * C_CHUNK)
    # Slots owned by some tile's processed range (for bwd garbage masking).
    slot = jnp.arange(capacity + pad, dtype=jnp.int32)
    tile_of_slot = jnp.pad(binning.sorted_tile, (0, pad), constant_values=num_tiles)
    safe_tile = jnp.clip(tile_of_slot, 0, num_tiles - 1)
    within = (
        slot - binning.tile_start[safe_tile] < count_clip[safe_tile]
    ) & (tile_of_slot < num_tiles)
    slot_mask = within.astype(jnp.float32)[None, :]

    shape_info = (tx_n, num_tiles, ch, max_chunks)
    img_t, final_t, n_contrib = tile_composite(
        shape_info,
        binning.tile_start,
        count_clip,
        slot_mask,
        dup_mean,
        dup_conic,
        dup_opac,
        dup_color,
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
