"""Host-side wrapper: binning output -> aligned dup-order gather -> Pallas.

Completes the production render path. Mosaic requires DMA slice offsets
along the lane dimension to be divisible by the tiling (128), so each tile's
duplication range is re-laid-out to start on a C_CHUNK boundary: a second
gather maps aligned slots back to the [tile|depth]-sorted order, padding
slots with opacity-0 entries (inert under the kernel's cutoff gates).

The pre-gather is ONE column gather of a packed (ROWS, N) array (profiled
~28 ms at 4.2M x 16 f32 on v5e — four separate narrow gathers cost ~4x).
Its transpose — reducing per-dup-slot gradients onto Gaussians — is a
custom VJP (``gather_dup``): XLA's scatter-add lowers to a serial loop
(~270 ms at this scale), so the backward instead sorts cotangent columns by
gaussian id (~7 ms), gathers them into segment-contiguous order (~28 ms),
and does a two-level segmented reduction: block-local f32 cumsums (bounded
512-term rounding) + f64 cumsum over per-block totals (exact middle terms),
finished by prefix-difference gathers at segment bounds. This is the
atomics-free grad reduction of SURVEY.md §7 hard part #2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sugar_tpu.raster import common as rc
from sugar_tpu.raster.binning import Binning, bucketize_by_offsets
from sugar_tpu.raster.pallas_composite import C_CHUNK, R_OP, ROWS, tile_composite
from sugar_tpu.raster.preprocess import Preprocessed

_BLOCK = 512  # segmented-reduction block (f32 rounding bound per segment)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_dup(packed: jnp.ndarray, gid: jnp.ndarray, n: int) -> jnp.ndarray:
    """dup_data (ROWS, D) = packed (ROWS, n) [:, gid (D,)].

    ``gid`` entries equal to ``n`` are padding (their cotangent is dropped).
    Backward is a sort-based segmented reduction (module docstring).
    """
    safe = jnp.minimum(gid, n - 1)
    return packed[:, safe]


def _gather_dup_fwd(packed, gid, n):
    return gather_dup(packed, gid, n), gid


def _gather_dup_bwd(n, gid, ct):
    rows, d = ct.shape
    d_pad = ((d + _BLOCK - 1) // _BLOCK) * _BLOCK
    # Sort dup slots by gaussian id; padding (gid == n) sorts last.
    slot = jnp.arange(d, dtype=jnp.int32)
    gid_sorted, perm = jax.lax.sort(
        (gid.astype(jnp.int32), slot), dimension=0, num_keys=1, is_stable=False
    )
    ct_s = ct[:, perm]  # (ROWS, D) one column gather
    if d_pad != d:
        ct_s = jnp.pad(ct_s, ((0, 0), (0, d_pad - d)))
    nb = d_pad // _BLOCK
    local = jnp.cumsum(ct_s.reshape(rows, nb, _BLOCK), axis=2)  # inclusive
    btot = local[..., -1]  # (ROWS, nb)
    bpre = jnp.cumsum(btot, axis=1) - btot  # exclusive block prefix
    local_flat = local.reshape(rows, d_pad)

    # Segment bounds per gaussian: one searchsorted over sorted gids.
    # Window sum [lo, hi) computed as (bpre[b(hi-1)] - bpre[b(lo-1)]) +
    # (local[hi-1] - local[lo-1]): separate differences keep same-block
    # segments at block-local (<= _BLOCK-term) f32 rounding — the block
    # prefixes cancel exactly — instead of eps * |global prefix|.
    bounds = jnp.searchsorted(
        gid_sorted, jnp.arange(n + 1, dtype=jnp.int32), side="left", method="sort"
    ).astype(jnp.int32)

    def pieces(i):
        # Exclusive-prefix pieces at index i (i in [0, d_pad]).
        j = jnp.maximum(i - 1, 0)
        m = (i > 0).astype(ct.dtype)
        return bpre[:, j // _BLOCK] * m, local_flat[:, j] * m

    bp_hi, loc_hi = pieces(bounds[1:])
    bp_lo, loc_lo = pieces(bounds[:-1])
    return (bp_hi - bp_lo) + (loc_hi - loc_lo), None


gather_dup.defvjp(_gather_dup_fwd, _gather_dup_bwd)


def pack_params(mean, conic, opac, color):
    """(N,2),(N,3),(N,),(N,CH) -> packed (ROWS, N). Differentiable."""
    ch = color.shape[-1]
    n = mean.shape[0]
    pad_rows = ROWS - 6 - ch
    return jnp.concatenate(
        [
            mean.T,
            conic.T,
            opac[None, :],
            color.T,
            jnp.zeros((pad_rows, n), mean.dtype),
        ],
        axis=0,
    )


def render_pallas(
    prep: Preprocessed,
    binning: Binning,
    settings: rc.RasterSettings,
    max_per_tile: int = 8192,
) -> dict:
    tx_n, ty_n = settings.tiles_x, settings.tiles_y
    num_tiles = tx_n * ty_n
    ch = prep.color.shape[-1]
    n = prep.mean2d.shape[0]
    max_chunks = max(1, (max_per_tile + C_CHUNK - 1) // C_CHUNK)

    capacity = binning.sorted_gauss.shape[0]
    count_clip = jnp.minimum(binning.tile_count, max_chunks * C_CHUNK)

    # ---- aligned re-layout: every tile range starts on a chunk boundary.
    aligned_counts = ((count_clip + C_CHUNK - 1) // C_CHUNK) * C_CHUNK
    aligned_start = jnp.cumsum(aligned_counts) - aligned_counts  # (T,)
    d_al = capacity + C_CHUNK * num_tiles  # static upper bound

    s = jnp.arange(d_al, dtype=jnp.int32)
    t = jnp.clip(bucketize_by_offsets(aligned_start, d_al), 0, num_tiles - 1)
    local = s - aligned_start[t]
    total_aligned = aligned_start[-1] + aligned_counts[-1]
    valid = (local < count_clip[t]) & (s < total_aligned)
    src_slot = jnp.clip(binning.tile_start[t] + local, 0, capacity - 1)
    # Padding slots point at gaussian n: gather_dup clamps them to a real
    # row but their cotangent lands in segment n, which is dropped.
    gid = jnp.where(valid, binning.sorted_gauss[src_slot], n)

    # Pack once (transposes, ~cheap), then ONE column gather.
    packed = pack_params(prep.mean2d, prep.conic, prep.opacity, prep.color)
    dup_data = gather_dup(packed, gid, n)  # (ROWS, D)
    # Padding columns carry a real gaussian's data; zero their opacity so
    # they are inert under the kernel's alpha cutoff. (The multiply keeps
    # gradients flowing to valid slots only.)
    slot_mask = valid.astype(jnp.float32)[None, :]
    row_sel = (jnp.arange(ROWS) == R_OP).astype(jnp.float32)[:, None]
    dup_data = dup_data * (1.0 - row_sel * (1.0 - slot_mask))

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
