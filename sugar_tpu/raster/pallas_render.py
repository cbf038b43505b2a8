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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gather_dup(
    packed: jnp.ndarray,
    gid: jnp.ndarray,
    counts: jnp.ndarray,
    grads_exact: jnp.ndarray,
    n: int,
    live_rows: int,
    seg_cap: int,
) -> jnp.ndarray:
    """dup_data (ROWS, D) = packed (ROWS, n) [:, gid (D,)].

    ``gid`` entries equal to ``n`` are padding/invalid slots (their
    cotangent is dropped); ``counts`` (n,) is the EXACT number of live dup
    slots each gaussian owns in ``gid`` (min(tiles_touched, tile_cap) when
    the capacity did not truncate real slots) — it gives the backward its
    segment offsets without a searchsorted (profiled 36 ms at bench scale);
    ``grads_exact`` is a () bool, False when capacity truncation dropped
    real slots so the counts-derived offsets are wrong — the backward then
    returns zeros instead of misattributed gradients (the auto-grow
    protocol in api.py re-renders such frames with a larger capacity).
    ``live_rows`` bounds the rows that can carry nonzero cotangents (the
    kernel zero-pads the rest); ``seg_cap`` is a static bound on how many
    dup slots any one gaussian owns (= the binning tile_cap) — it bounds
    the backward's segmented-scan depth.
    """
    safe = jnp.minimum(gid, n - 1)
    return packed[:, safe]


def _gather_dup_fwd(packed, gid, counts, grads_exact, n, live_rows, seg_cap):
    out = gather_dup(packed, gid, counts, grads_exact, n, live_rows, seg_cap)
    return out, (gid, counts, grads_exact)


def _gather_dup_bwd(n, live_rows, seg_cap, res, ct):
    """Segmented reduction of dup-slot cotangents onto Gaussians.

    Sort slots by gaussian id (segments become contiguous, length <=
    seg_cap; invalid/padding slots carry the sentinel ``n`` and sort
    last), permute the cotangent columns, then reduce segments onto
    Gaussians with the MXU one-hot kernel (raster.segsum) — replacing the
    previous shift-and-add scan + start-position gather, whose extraction
    gather alone cost ~28 ms at bench scale. f32 throughout.
    """
    from sugar_tpu.raster.segsum import segment_sum_sorted

    gid, counts, grads_exact = res
    del counts  # the segment kernel needs no offsets
    d = ct.shape[1]
    slot = jnp.arange(d, dtype=jnp.int32)
    gid_sorted, perm = jax.lax.sort(
        (gid.astype(jnp.int32), slot), dimension=0, num_keys=1, is_stable=False
    )
    y = ct[:, perm]  # one column gather (row width is free)
    d_all = segment_sum_sorted(y, gid_sorted, n)
    d_all = jnp.where(grads_exact, d_all, 0.0)
    return d_all, None, None, None


gather_dup.defvjp(_gather_dup_fwd, _gather_dup_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gather_dup_searchsorted(
    packed: jnp.ndarray, gid: jnp.ndarray, n: int, live_rows: int, seg_cap: int
) -> jnp.ndarray:
    """gather_dup variant whose backward finds segment starts with a
    searchsorted instead of counts-derived offsets.

    ~36 ms slower at bench scale, but correct for ANY gid multiset — used
    by the multi-chip path (parallel/render.py), where a gaussian's dup
    slots are split across device bands so no per-device counts exist.
    """
    safe = jnp.minimum(gid, n - 1)
    return packed[:, safe]


def _gather_dup_ss_fwd(packed, gid, n, live_rows, seg_cap):
    return gather_dup_searchsorted(packed, gid, n, live_rows, seg_cap), gid


def _gather_dup_ss_bwd(n, live_rows, seg_cap, gid, ct):
    """Correct for ANY gid multiset (no per-device counts needed) — and
    since the segment kernel derives segments from the sorted ids alone,
    it is now the same reduction as _gather_dup_bwd."""
    from sugar_tpu.raster.segsum import segment_sum_sorted

    d = ct.shape[1]
    slot = jnp.arange(d, dtype=jnp.int32)
    gid_sorted, perm = jax.lax.sort(
        (gid.astype(jnp.int32), slot), dimension=0, num_keys=1, is_stable=False
    )
    y = ct[:, perm]
    return segment_sum_sorted(y, gid_sorted, n), None


gather_dup_searchsorted.defvjp(_gather_dup_ss_fwd, _gather_dup_ss_bwd)


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
    # Per-gaussian live-slot counts: exact segment sizes for the gradient
    # reduction while the capacity did not truncate real slots (guaranteed
    # by the auto-grow protocol; see gather_dup docstring).
    dup_counts = jnp.minimum(prep.tiles_touched, seg_cap).astype(jnp.int32)
    grads_exact = binning.num_rendered <= d

    # Pack once (transposes, ~cheap), then ONE column gather. Dup slots
    # belonging to no tile range (invalid tail, padding) are never read by
    # the kernel and their grad columns stay zero-initialized, so no
    # masking pass is needed.
    packed = pack_params(prep.mean2d, prep.conic, prep.opacity, prep.color)
    dup9 = gather_dup(
        packed, gid, dup_counts, grads_exact, n, 6 + ch, seg_cap
    )  # (6+CH, D_pad)
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
    max_tile_count = jnp.max(binning.tile_count)
    tile_overflow = jnp.maximum(max_tile_count - max_chunks * C_CHUNK, 0)
    return dict(
        image=image,
        final_T=final_t,
        n_contrib=n_contrib,
        tile_overflow=tile_overflow,
        # Sizing diagnostics for the auto-grow protocol (raster.adaptive):
        # the k_max a re-jit needs to cover the deepest tile exactly.
        max_tile_count=max_tile_count,
    )
