"""Tile binning with static shapes: duplicate -> sort -> per-tile ranges.

TPU-native replacement for the CUDA binning stage (rasterizer_impl.cu:70-138,
277-314): cub's data-dependent prefix-sum + 64-bit radix sort become a
fixed-capacity "dense expansion" plus sorts sized to the measured TPU cost
model (lax.sort ~7-12 ms / 4M keys on v5e; gathers dominate at ~7 ms / 4M
int32 — so the design minimizes *payload bytes carried through sorts*):

1. Gaussians are globally **depth-sorted first** (N keys, not capacity keys)
   so dup slots are emitted in depth-major order;
2. an exclusive cumsum of depth-ordered touched-tile counts gives duplication
   offsets (cub InclusiveSum equivalent); every dup slot d finds its source
   via a `searchsorted` over the offsets (scatter-free, static shape) and
   derives its tile coordinate from d's position inside the Gaussian's tile
   rect (row-major, as duplicateWithKeys rasterizer_impl.cu:70-111);
3. ONE single-key stable sort on tile_id groups dups per tile; within a
   tile, the stable order preserves depth-major emission = exact per-tile
   depth order. CUDA's [tileID | depth-bits] radix sort ties (equal f32
   depth) resolve to duplication order = Gaussian index order; the depth
   presort is stable on index so ties match exactly.
4. per-tile [start, count) ranges come from ONE searchsorted over
   arange(T+1) — tile ids are dense, so end[t] == start[t+1]
   (identifyTileRanges equivalent).

Capacity is a static upper bound on total duplications; overflow (true total
exceeding capacity) is reported so the caller can re-jit with a larger
bucket — the analog of the CUDA resizable byte buffers
(rasterizer_impl.cu:155-194) under XLA static shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sugar_tpu.raster import common as rc
from sugar_tpu.raster.preprocess import Preprocessed


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Binning:
    sorted_gauss: jnp.ndarray  # (capacity,) int32 gaussian index per dup slot
    sorted_tile: jnp.ndarray  # (capacity,) int32 tile id (num_tiles = invalid)
    tile_start: jnp.ndarray  # (num_tiles,) int32 offset into sorted arrays
    tile_count: jnp.ndarray  # (num_tiles,) int32
    num_rendered: jnp.ndarray  # () int32 true total duplications
    overflow: jnp.ndarray  # () int32 dropped duplications (0 = exact)


def bucketize_by_offsets(offsets: jnp.ndarray, size: int) -> jnp.ndarray:
    """For sorted exclusive-cumsum ``offsets`` (N,), return g (size,) with
    g[d] = last index whose offset <= d.

    TPU note: the default searchsorted ('scan') lowers to a scalar-core
    binary-search loop (~100 ms/M lookups profiled) and XLA scatter is
    serial too (~60 ms/M); method='sort' rides the fast TPU radix sort
    (~10 ms for 5M keys)."""
    d = jnp.arange(size, dtype=offsets.dtype)
    return (
        jnp.searchsorted(offsets, d, side="right", method="sort").astype(jnp.int32)
        - 1
    )


def bin_gaussians(prep: Preprocessed, settings: rc.RasterSettings, capacity: int) -> Binning:
    n = prep.tiles_touched.shape[0]
    num_tiles = settings.tiles_x * settings.tiles_y

    # 1. Depth presort of Gaussians (N keys — 4-8x fewer than capacity).
    # Culled Gaussians (tiles_touched == 0) emit no dups wherever they land.
    idx = jnp.arange(n, dtype=jnp.int32)
    _, gsort = jax.lax.sort(
        (prep.depth, idx), dimension=0, num_keys=1, is_stable=True
    )
    counts = prep.tiles_touched[gsort].astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts  # exclusive, depth-major
    total = offsets[-1] + counts[-1]

    # 2. Dense expansion: dup slot -> depth-rank r -> gaussian g.
    d = jnp.arange(capacity, dtype=jnp.int32)
    r = jnp.clip(bucketize_by_offsets(offsets, capacity), 0, n - 1)
    g = gsort[r]
    local = d - offsets[r]
    in_range = (d < total) & (local < counts[r])

    rmin = prep.rect_min[g]  # (capacity, 2) gather
    rw_safe = jnp.maximum(prep.rect_max[g, 0] - rmin[..., 0], 1)
    tx = rmin[..., 0] + local % rw_safe
    ty = rmin[..., 1] + local // rw_safe
    tile_id = jnp.where(in_range, ty * settings.tiles_x + tx, num_tiles)

    # 3. Single-key stable sort by tile; emission order is depth-major, so
    # within-tile order == depth order (ties: gaussian index, as CUDA).
    sorted_tile, sorted_gauss = jax.lax.sort(
        (tile_id, g), dimension=0, num_keys=1, is_stable=True
    )

    # 4. Ranges: dense tile ids => end[t] == start[t+1]; one searchsorted.
    bounds = jnp.searchsorted(
        sorted_tile,
        jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left",
        method="sort",
    ).astype(jnp.int32)
    tile_start = bounds[:num_tiles]
    tile_count = bounds[1:] - bounds[:num_tiles]

    return Binning(
        sorted_gauss=sorted_gauss,
        sorted_tile=sorted_tile,
        tile_start=tile_start,
        tile_count=tile_count,
        num_rendered=total,
        overflow=jnp.maximum(total - capacity, 0),
    )
