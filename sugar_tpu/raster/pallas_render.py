"""Host-side wrapper: dense binning -> one dup-order gather -> Pallas.

Completes the production render path. The dup array is consumed by the
kernel exactly in [tile|depth]-sorted order — the kernel DMAs each tile's
chunk-floor-aligned slot range and masks non-owned lead/tail slots, so no
aligned re-layout pass is needed (a previous revision spent a full
searchsorted + gather over the dup array on it).

The pre-gather is ONE column gather of a packed (6+CH, N) array. Its
transpose — reducing per-dup-slot gradients onto Gaussians — is a custom
VJP (``gather_dup``): XLA's scatter-add lowers to a serial loop (~270 ms
at 4M slots on v5e), so the backward instead sorts cotangent columns by
gaussian id (segments become contiguous with length <= tile_cap), runs a
log2(tile_cap)-step segmented shift-and-add suffix scan, and gathers each
segment's sum at its start position. This is the atomics-free grad
reduction of SURVEY.md §7 hard part #2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sugar_tpu.raster import common as rc
from sugar_tpu.raster.binning import Binning
from sugar_tpu.raster.pallas_composite import C_CHUNK, tile_composite
from sugar_tpu.raster.preprocess import Preprocessed

_BLOCK = 512  # segmented-reduction block (f32 rounding bound per segment)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gather_dup(
    packed: jnp.ndarray, gid: jnp.ndarray, n: int, live_rows: int, seg_cap: int
) -> jnp.ndarray:
    """dup_data (ROWS, D) = packed (ROWS, n) [:, gid (D,)].

    ``gid`` entries equal to ``n`` are padding (their cotangent is
    dropped); ``live_rows`` bounds the rows that can carry nonzero
    cotangents (the kernel zero-pads the rest); ``seg_cap`` is a static
    bound on how many dup slots any one gaussian owns (= the binning
    tile_cap) — it bounds the backward's segmented-scan depth.
    """
    safe = jnp.minimum(gid, n - 1)
    return packed[:, safe]


def _gather_dup_fwd(packed, gid, n, live_rows, seg_cap):
    return gather_dup(packed, gid, n, live_rows, seg_cap), gid


def _gather_dup_bwd(n, live_rows, seg_cap, gid, ct):
    """Segmented reduction of dup-slot cotangents onto Gaussians.

    Sort slots by gaussian id (segments become contiguous, length <=
    seg_cap), then a log2(seg_cap)-step shift-and-add suffix scan inside
    segments puts each segment's full sum at its FIRST slot; one gather at
    the segment-start positions (a searchsorted over the sorted ids) reads
    it out. f32 throughout: each sum has <= seg_cap terms.
    """
    rows, d = ct.shape
    ct = ct[:live_rows]
    # Sort dup slots by gaussian id; padding (gid == n) sorts last.
    slot = jnp.arange(d, dtype=jnp.int32)
    gid_sorted, perm = jax.lax.sort(
        (gid.astype(jnp.int32), slot), dimension=0, num_keys=1, is_stable=False
    )
    y = ct[:, perm]  # (live_rows, D) one column gather
    sh = 1
    while sh < seg_cap:
        y_next = jnp.pad(y[:, sh:], ((0, 0), (0, sh)))
        g_next = jnp.pad(gid_sorted[sh:], (0, sh), constant_values=-1)
        y = y + jnp.where((g_next == gid_sorted)[None, :], y_next, 0.0)
        sh *= 2

    starts = jnp.searchsorted(
        gid_sorted, jnp.arange(n + 1, dtype=jnp.int32), side="left", method="sort"
    ).astype(jnp.int32)
    nonempty = starts[:-1] < starts[1:]
    d_live = jnp.where(
        nonempty[None, :], y[:, jnp.minimum(starts[:-1], d - 1)], 0.0
    )
    if rows != live_rows:
        d_live = jnp.pad(d_live, ((0, rows - live_rows), (0, 0)))
    return d_live, None


gather_dup.defvjp(_gather_dup_fwd, _gather_dup_bwd)


def pack_params(mean, conic, opac, color):
    """(N,2),(N,3),(N,),(N,CH) -> packed (6+CH, N). Differentiable."""
    return jnp.concatenate(
        [mean.T, conic.T, opac[None, :], color.T], axis=0
    )


def render_pallas(
    prep: Preprocessed,
    binning: Binning,
    settings: rc.RasterSettings,
    max_per_tile: int = 8192,
    seg_cap: int = 64,
) -> dict:
    tx_n, ty_n = settings.tiles_x, settings.tiles_y
    num_tiles = tx_n * ty_n
    ch = prep.color.shape[-1]
    n = prep.mean2d.shape[0]
    max_chunks = max(1, (max_per_tile + C_CHUNK - 1) // C_CHUNK)

    d = binning.sorted_gauss.shape[0]
    # Pad so the kernel's chunk-floor DMA of the last tile stays in bounds.
    d_pad = ((d + C_CHUNK - 1) // C_CHUNK) * C_CHUNK + C_CHUNK
    gid = jnp.concatenate(
        [binning.sorted_gauss, jnp.full((d_pad - d,), n, jnp.int32)]
    )
    count_clip = jnp.minimum(binning.tile_count, max_chunks * C_CHUNK)

    # Pack once (transposes, ~cheap), then ONE column gather. Dup slots
    # belonging to no tile range (invalid tail, padding) are never read by
    # the kernel and their grad columns stay zero-initialized, so no
    # masking pass is needed.
    packed = pack_params(prep.mean2d, prep.conic, prep.opacity, prep.color)
    dup9 = gather_dup(packed, gid, n, 6 + ch, seg_cap)  # (6+CH, D_pad)
    # Mosaic DMA slices need 8-aligned sublane counts: zero-pad rows AFTER
    # the gather (the pad is one cheap copy; gathering dead rows is not).
    rows_pad = ((6 + ch + 7) // 8) * 8
    dup_data = jnp.pad(dup9, ((0, rows_pad - 6 - ch), (0, 0)))

    shape_info = (tx_n, num_tiles, ch, max_chunks)
    img_t, final_t, n_contrib = tile_composite(
        shape_info,
        binning.tile_start,
        count_clip,
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
