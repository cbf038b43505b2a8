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


def bin_gaussians_dense(
    prep: Preprocessed,
    settings: rc.RasterSettings,
    tile_cap: int,
    capacity: int | None = None,
) -> Binning:
    """Gather-free binning: dense (N, tile_cap) expansion + ONE stable sort.

    The production fast path. ``bin_gaussians`` below derives each dup
    slot's source Gaussian with a searchsorted over duplication offsets
    plus several capacity-sized gathers — profiled ~315 ms/step at 1M
    Gaussians x 4M dups on v5e, dominated by TPU gather (~7 cycles/elem)
    and the sort-based searchsorted. Here every Gaussian instead owns a
    fixed row of ``tile_cap`` dup slots whose tile ids are pure elementwise
    math on (N, tile_cap) arrays, so the only capacity-sized data movement
    is the single [tile]-key sort (~3.5 ns/key):

    1. stable depth presort of Gaussians (N keys) + ONE (4, N) gather puts
       expansion inputs in depth order, so slots are emitted depth-major;
    2. slot (i, j) = j-th tile of depth-ranked Gaussian i's rect, row-major
       (duplicateWithKeys order, rasterizer_impl.cu:70-111), invalid slots
       get tile id ``num_tiles`` and sort to the tail;
    3. ONE stable sort on tile id groups slots per tile; stability keeps
       depth-major emission = exact per-tile depth order, ties (equal f32
       depth) resolving to Gaussian index order as CUDA's radix sort does;
    4. per-tile [start, count) from a binary-search searchsorted (the
       query side is tiny: num_tiles + 1).

    Gaussians whose tile rect exceeds ``tile_cap`` have their trailing
    tiles dropped and counted in ``overflow`` — the caller re-jits with a
    larger cap, the same protocol as ``bin_gaussians``'s capacity (CUDA
    resizes its buffers dynamically, rasterizer_impl.cu:155-194).

    ``capacity`` (default N * tile_cap = lossless) truncates the sorted
    dup arrays: valid slots sort before the invalid tail, so the slice is
    exact while num_rendered <= capacity (excess counted in ``overflow``),
    and it keeps every downstream per-dup-slot pass (data gather, gradient
    reduction) sized to the true duplication count instead of the dense
    expansion bound.
    """
    n = prep.tiles_touched.shape[0]
    num_tiles = settings.tiles_x * settings.tiles_y

    # 1. Depth presort + one packed gather into depth order.
    idx = jnp.arange(n, dtype=jnp.int32)
    _, gsort = jax.lax.sort(
        (prep.depth, idx), dimension=0, num_keys=1, is_stable=True
    )
    counts = jnp.minimum(prep.tiles_touched, tile_cap)
    pk = jnp.stack(
        [
            prep.rect_min[:, 0],
            prep.rect_min[:, 1],
            jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1),
            counts,
        ],
        axis=0,
    )[:, gsort]  # (4, N)

    # 2. Dense expansion: slot (i, j) -> tile id, elementwise on (N, M).
    j = jnp.arange(tile_cap, dtype=jnp.int32)[None, :]
    w = pk[2][:, None]
    # Integer j // w via f32 divide: exact for j < 2^24 / max(tiles_x)
    # (int32 div lowers poorly on the VPU). j <= tile_cap here.
    ty_off = jnp.floor(j.astype(jnp.float32) / w.astype(jnp.float32)).astype(
        jnp.int32
    )
    tx_off = j - ty_off * w
    tile_e = (pk[1][:, None] + ty_off) * settings.tiles_x + pk[0][:, None] + tx_off
    valid_e = j < pk[3][:, None]
    tile_e = jnp.where(valid_e, tile_e, num_tiles)
    # Invalid slots carry the sentinel gaussian id n (not their real id):
    # downstream gradient reduction relies on the sorted array containing
    # EXACTLY counts[g] slots per gaussian g, with all non-live slots
    # segregated at the tail (gather_dup counts-derived segment offsets).
    gid_e = jnp.where(valid_e, jnp.broadcast_to(gsort[:, None], (n, tile_cap)), n)

    # 3. One sort by tile id over the (N * M,) expansion. When
    # [tile | depth-rank] fits in 31 bits the fused key is UNIQUE, so the
    # ~35% stability overhead of the sort network can be dropped (the rank
    # field reproduces exactly what stability provided); otherwise fall
    # back to a stable single-key sort (emission is depth-rank-major).
    rank_bits = max(1, (n - 1).bit_length())
    if (num_tiles + 1) << rank_bits < 2**31:
        rank_e = jax.lax.broadcasted_iota(jnp.int32, (n, tile_cap), 0)
        key_e = (tile_e << rank_bits) | rank_e
        sorted_key, sorted_gauss = jax.lax.sort(
            (key_e.reshape(-1), gid_e.reshape(-1)),
            dimension=0,
            num_keys=1,
            is_stable=False,
        )
        sorted_tile = sorted_key >> rank_bits
    else:
        sorted_tile, sorted_gauss = jax.lax.sort(
            (tile_e.reshape(-1), gid_e.reshape(-1)),
            dimension=0,
            num_keys=1,
            is_stable=True,
        )
    num_rendered = jnp.sum(counts)
    cap_overflow = jnp.zeros((), jnp.int32)
    if capacity is not None and capacity < n * tile_cap:
        sorted_tile = sorted_tile[:capacity]
        sorted_gauss = sorted_gauss[:capacity]
        cap_overflow = jnp.maximum(num_rendered - capacity, 0)

    # 4. Ranges: dense tile ids => end[t] == start[t+1]. The query side is
    # tiny so the binary-search lowering beats the sort-based one.
    bounds = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start = bounds[:num_tiles]
    tile_count = bounds[1:] - bounds[:num_tiles]

    return Binning(
        sorted_gauss=sorted_gauss,
        sorted_tile=sorted_tile,
        tile_start=tile_start,
        tile_count=tile_count,
        num_rendered=num_rendered,
        overflow=jnp.sum(jnp.maximum(prep.tiles_touched - tile_cap, 0))
        + cap_overflow,
    )


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
