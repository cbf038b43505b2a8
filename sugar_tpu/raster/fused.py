"""Fused binning + data layout for the production Pallas render path.

Replaces the two-pass [bin_gaussians_dense -> gather_dup] pipeline with ONE
payload-carrying sort, plus an exact-support tile culling pass. Motivated by
measured v5e cost structure (scripts/microbench_sort.py, PERF.md):

- ``lax.sort`` payload count is nearly FREE (2.56M keys + 1 payload 8.9 ms,
  + 10 payloads 9.4 ms), while gathers cost ~8 ns per *lookup* regardless of
  row width (2.56M lookups = 21-27 ms). So instead of sorting (key, gid) and
  then gathering the packed per-Gaussian render data into dup order (23 ms),
  the sort carries all 6+CH packed rows as payloads directly.
- The dense (N, tile_cap) expansion sorted 16M slots for ~2.1M real dups
  (35.8 ms). Here the expansion is BUCKETED: every Gaussian owns a width-
  ``cap_a`` row (covers 97%+ of real scenes' rects), and the few Gaussians
  whose tile rect exceeds ``cap_a`` are compacted (via a 1M-key partition
  sort, payloads again free) into ``big_cap`` rows of width
  ``tile_cap - cap_a``. Expansion 16M -> ~4.8M at bench scale.
- Exact-support culling: a tile in a Gaussian's bounding rect whose pixels
  ALL have alpha < ALPHA_CUTOFF can never contribute to the forward image
  nor receive/emit gradients (the compositing kernel's ``keep`` gate zeroes
  such samples; CUDA likewise ``continue``s on alpha < 1/255,
  forward.cu:254). The continuous box-minimum of the conic quadratic
  q(d) = 0.5 a dx^2 + b dx dy + 0.5 c dy^2 lower-bounds the discrete pixel
  minimum, so culling tiles with min_box q > ln(opacity/cutoff) is EXACTLY
  output- and gradient-preserving while dropping ~23% of dup slots (and the
  kernel work, capacity, and backward-reduction work they would cost). This
  is strictly tighter than the CUDA rect (auxiliary.h:46-56) at equal
  semantics.

The backward (custom VJP) reduces per-dup-slot cotangents onto Gaussians
with the same payload trick: sort cotangent ROWS as payloads keyed by
gaussian id (replacing the sort + (9, D) column gather of
pallas_render.gather_dup), then the log2(tile_cap)-step segmented
shift-and-add scan and one start-position gather, as before. Ordering
semantics are identical to the CUDA [tileID | depth] radix sort
(rasterizer_impl.cu:70-138): slots emit depth-rank-major, ties in depth
resolve to Gaussian index order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sugar_tpu.raster import common as rc
from sugar_tpu.raster.pallas_composite import C_CHUNK, tile_composite
from sugar_tpu.raster.preprocess import Preprocessed

# Safety margin on the support test: the continuous box minimum is computed
# in f32; err on the side of KEEPING a boundary tile.
_Q_EPS = 1e-3


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _box_qmin(lx, hx, ly, hy, a, b, c):
    """Min over the box [lx,hx]x[ly,hy] of q = 0.5 a dx^2 + b dx dy + 0.5 c dy^2.

    q is positive definite for valid conics (det > 0 guaranteed by
    preprocess), so the unconstrained minimum is 0 at the mean; when the
    mean lies outside the box the minimum is on the boundary — evaluated
    exactly on all four edges (each a 1D quadratic with a clamped vertex).
    """
    inside = (lx <= 0.0) & (hx >= 0.0) & (ly <= 0.0) & (hy >= 0.0)
    a_s = jnp.maximum(a, 1e-30)
    c_s = jnp.maximum(c, 1e-30)

    def edge_x(ex):
        dy = jnp.clip(-b * ex / c_s, ly, hy)
        return 0.5 * a * ex * ex + b * ex * dy + 0.5 * c * dy * dy

    def edge_y(ey):
        dx = jnp.clip(-b * ey / a_s, lx, hx)
        return 0.5 * c * ey * ey + b * ey * dx + 0.5 * a * dx * dx

    qmin = jnp.minimum(
        jnp.minimum(edge_x(lx), edge_x(hx)),
        jnp.minimum(edge_y(ly), edge_y(hy)),
    )
    return jnp.where(inside, 0.0, qmin)


def _slot_tiles(rmin_x, rmin_y, rect_w, j):
    """Row-major tile coordinates of slot j inside a Gaussian's rect.

    ``j`` is (..., M) int32; rect params broadcast from (..., 1). Uses the
    f32-divide trick for j // w (int32 div lowers poorly on the VPU; exact
    for j < 2^24)."""
    ty_off = jnp.floor(j.astype(jnp.float32) / rect_w.astype(jnp.float32)).astype(
        jnp.int32
    )
    tx_off = j - ty_off * rect_w
    return rmin_x + tx_off, rmin_y + ty_off


def _slot_valid(tx, ty, j, counts, mx, my, ca, cb, cc, qmax, tiles_x):
    """Validity of expansion slots: inside the (capped) rect AND the tile's
    pixel box intersects the alpha >= cutoff support ellipse."""
    in_rect = j < counts
    x0 = (tx * rc.TILE_X).astype(jnp.float32)
    y0 = (ty * rc.TILE_Y).astype(jnp.float32)
    qmin = _box_qmin(
        x0 - mx,
        x0 + (rc.TILE_X - 1) - mx,
        y0 - my,
        y0 + (rc.TILE_Y - 1) - my,
        ca,
        cb,
        cc,
    )
    return in_rect & (qmin <= qmax + _Q_EPS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def dup_sort(
    packed: jnp.ndarray,  # (6+CH, N) differentiable render data
    depth: jnp.ndarray,  # (N,) view z (stop-gradded key input)
    rect_min: jnp.ndarray,  # (N, 2) int32
    rect_max: jnp.ndarray,  # (N, 2) int32
    tiles_touched: jnp.ndarray,  # (N,) int32
    key_packed: jnp.ndarray,  # (6+CH, N) stop_gradient(packed) for key math
    num_tiles: int,
    tiles_x: int,
    tile_cap: int,
    cap_a: int,
    big_cap: int,
    capacity: int,
):
    """Emit the packed dup array in [tile | depth]-sorted order.

    Returns (dup_data (rows8, D_pad), gid (D_pad,), tile_start (T,),
    tile_count (T,), counts_culled (N,), num_rendered (), overflow (),
    big_overflow ()). Differentiable in ``packed`` only; the support/order
    decisions (like CUDA's rect and sort) carry no gradient.
    """
    out, _ = _dup_sort_fwd(
        packed, depth, rect_min, rect_max, tiles_touched, key_packed,
        num_tiles, tiles_x, tile_cap, cap_a, big_cap, capacity,
    )
    return out


def _dup_sort_impl(
    packed, depth, rect_min, rect_max, tiles_touched, key_packed,
    num_tiles, tiles_x, tile_cap, cap_a, big_cap, capacity,
):
    rows, n = packed.shape
    cap_a = min(cap_a, tile_cap)
    big_cap = min(big_cap, n)
    cap_b = tile_cap - cap_a

    mx, my = key_packed[0], key_packed[1]
    ca, cb, cc = key_packed[2], key_packed[3], key_packed[4]
    opac = key_packed[5]
    qmax = jnp.log(jnp.maximum(opac, 1e-30) / rc.ALPHA_CUTOFF)
    counts = jnp.minimum(tiles_touched, tile_cap).astype(jnp.int32)
    rmin_x, rmin_y = rect_min[:, 0], rect_min[:, 1]
    rect_w = jnp.maximum(rect_max[:, 0] - rmin_x, 1)

    # LAYOUT NOTE: all (slots-per-gaussian, N) expansion math runs with the
    # slot axis LEADING — per-Gaussian vectors broadcast along sublanes and
    # each row flattens as a contiguous copy. The (N, cap) orientation costs
    # a lane-interleave relayout per array (profiled 19 ms vs ~1 ms at bench
    # scale). Flat emission order is (slot j, gaussian) — irrelevant, the
    # sort key carries [tile | rank].

    # --- exact-support validity over the FULL capped rect, original order:
    # gives per-Gaussian culled counts (the backward's exact segment sizes)
    # before any permutation. Pure elementwise (tile_cap, N) math.
    j_full = jnp.arange(tile_cap, dtype=jnp.int32)[:, None]
    txf, tyf = _slot_tiles(rmin_x[None, :], rmin_y[None, :], rect_w[None, :], j_full)
    valid_full = _slot_valid(
        txf, tyf, j_full, counts[None, :], mx[None, :], my[None, :],
        ca[None, :], cb[None, :], cc[None, :], qmax[None, :], tiles_x,
    )
    counts_culled = jnp.sum(valid_full, axis=0, dtype=jnp.int32)
    num_rendered = jnp.sum(counts_culled)

    # --- depth rank per Gaussian (original order): two N-key sorts.
    # rank = position in the stable depth sort, so equal-depth ties resolve
    # to Gaussian index order exactly as CUDA's stable radix sort does.
    iota = jnp.arange(n, dtype=jnp.int32)
    _, gsort = jax.lax.sort((depth, iota), dimension=0, num_keys=1, is_stable=True)
    _, rank = jax.lax.sort((gsort, iota), dimension=0, num_keys=1, is_stable=False)

    # --- bucket A: every Gaussian owns cap_a slots (leading slot axis).
    tile_a = jnp.where(valid_full[:cap_a], tyf[:cap_a] * tiles_x + txf[:cap_a],
                       num_tiles)
    gid_a = jnp.where(valid_full[:cap_a], iota[None, :], n)
    rank_a = jnp.broadcast_to(rank[None, :], (cap_a, n))
    pl_a = [jnp.broadcast_to(packed[r][None, :], (cap_a, n)) for r in range(rows)]

    parts_tile = [tile_a.reshape(-1)]
    parts_rank = [rank_a.reshape(-1)]
    parts_gid = [gid_a.reshape(-1)]
    parts_pl = [[p.reshape(-1)] for p in pl_a]

    big_overflow = jnp.zeros((), jnp.int32)
    if cap_b > 0 and big_cap > 0:
        # --- bucket B: Gaussians with rect > cap_a tiles, compacted into
        # big_cap rows by a partition sort carrying all per-row data as
        # payloads (payloads are ~free; a gather here would cost ~8 ns/row).
        is_big = counts > cap_a
        bkey = jnp.where(is_big, 0, 1).astype(jnp.int32)
        srt = jax.lax.sort(
            (bkey, iota, rank, counts, rmin_x, rmin_y, rect_w, mx, my, ca, cb,
             cc, qmax) + tuple(packed[r] for r in range(rows)),
            dimension=0, num_keys=1, is_stable=True,
        )
        (_, b_iota, b_rank, b_counts, b_rx, b_ry, b_rw, b_mx, b_my, b_ca,
         b_cb, b_cc, b_qmax) = (s[:big_cap] for s in srt[:13])
        b_pl = [s[:big_cap] for s in srt[13:]]
        # Rows beyond the real big count are small Gaussians (counts <=
        # cap_a): their j >= cap_a slots fail the in_rect test => invalid.
        j_b = cap_a + jnp.arange(cap_b, dtype=jnp.int32)[:, None]
        txb, tyb = _slot_tiles(b_rx[None, :], b_ry[None, :], b_rw[None, :], j_b)
        valid_b = _slot_valid(
            txb, tyb, j_b, b_counts[None, :], b_mx[None, :], b_my[None, :],
            b_ca[None, :], b_cb[None, :], b_cc[None, :], b_qmax[None, :], tiles_x,
        )
        tile_b = jnp.where(valid_b, tyb * tiles_x + txb, num_tiles)
        gid_b = jnp.where(valid_b, b_iota[None, :], n)
        rank_b = jnp.broadcast_to(b_rank[None, :], (cap_b, big_cap))
        parts_tile.append(tile_b.reshape(-1))
        parts_rank.append(rank_b.reshape(-1))
        parts_gid.append(gid_b.reshape(-1))
        for r in range(rows):
            parts_pl[r].append(
                jnp.broadcast_to(b_pl[r][None, :], (cap_b, big_cap)).reshape(-1)
            )
        # Big Gaussians that did not fit in big_cap rows lose their j >=
        # cap_a slots: count them (their A slots remain, so counts_culled
        # no longer matches the emitted multiset -> grads inexact).
        n_big = jnp.sum(is_big.astype(jnp.int32))
        pos = jnp.arange(n, dtype=jnp.int32)
        dropped = (pos >= big_cap) & (pos < n_big)
        srt_counts_full = srt[3]
        big_overflow = jnp.sum(
            jnp.where(dropped, jnp.maximum(srt_counts_full - cap_a, 0), 0)
        )

    tile_e = jnp.concatenate(parts_tile)
    rank_e = jnp.concatenate(parts_rank)
    gid_e = jnp.concatenate(parts_gid)
    pl_e = [jnp.concatenate(p) for p in parts_pl]

    # --- THE sort: [tile | depth-rank] fused into one unique int32 key when
    # the bits fit (no stability cost), else two int keys (pairs are unique
    # either way — rank is unique per Gaussian).
    rank_bits = max(1, (n - 1).bit_length())
    if (num_tiles + 1) << rank_bits < 2**31:
        key_e = (tile_e << rank_bits) | rank_e
        srt = jax.lax.sort(
            (key_e, gid_e) + tuple(pl_e), dimension=0, num_keys=1, is_stable=False
        )
        sorted_tile_full = srt[0] >> rank_bits
    else:
        srt = jax.lax.sort(
            (tile_e, rank_e, gid_e) + tuple(pl_e),
            dimension=0, num_keys=2, is_stable=False,
        )
        sorted_tile_full = srt[0]
        srt = (srt[0],) + srt[2:]

    # --- truncate to the chunk-aligned capacity (valid slots sort first).
    d_pad = ((capacity + C_CHUNK - 1) // C_CHUNK) * C_CHUNK + C_CHUNK
    e_total = tile_e.shape[0]
    if e_total < d_pad:
        pad = d_pad - e_total
        sorted_tile = jnp.concatenate(
            [sorted_tile_full, jnp.full((pad,), num_tiles, jnp.int32)]
        )
        gid_s = jnp.concatenate([srt[1], jnp.full((pad,), n, jnp.int32)])
        pl_s = [jnp.concatenate([p, jnp.zeros((pad,), p.dtype)]) for p in srt[2:]]
    else:
        sorted_tile = sorted_tile_full[:d_pad]
        gid_s = srt[1][:d_pad]
        pl_s = [p[:d_pad] for p in srt[2:]]

    # --- per-tile ranges (tiny query side: binary-search lowering).
    bounds = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start = bounds[:num_tiles]
    tile_count = bounds[1:] - bounds[:num_tiles]

    # --- kernel layout: stack payload rows, zero-pad sublanes to 8-aligned.
    rows_pad = _round8(rows)
    dup_data = jnp.concatenate(
        [jnp.stack(pl_s), jnp.zeros((rows_pad - rows, d_pad), jnp.float32)], axis=0
    )

    rect_overflow = jnp.sum(jnp.maximum(tiles_touched - tile_cap, 0))
    cap_overflow = jnp.maximum(num_rendered - capacity, 0)
    overflow = rect_overflow + big_overflow + cap_overflow
    return (
        dup_data, gid_s, tile_start, tile_count, counts_culled,
        num_rendered, overflow, big_overflow + cap_overflow,
    )


def _dup_sort_fwd(
    packed, depth, rect_min, rect_max, tiles_touched, key_packed,
    num_tiles, tiles_x, tile_cap, cap_a, big_cap, capacity,
):
    out = _dup_sort_impl(
        packed, depth, rect_min, rect_max, tiles_touched, key_packed,
        num_tiles, tiles_x, tile_cap, cap_a, big_cap, capacity,
    )
    (dup_data, gid_s, tile_start, tile_count, counts_culled,
     num_rendered, overflow, inexact) = out
    # grads_exact: every live slot of every Gaussian is present exactly once
    # in the emitted multiset (no big_cap/capacity truncation).
    grads_exact = inexact == 0
    res = (gid_s, counts_culled, grads_exact, packed.shape[0])
    return out, res


def _dup_sort_bwd(
    num_tiles, tiles_x, tile_cap, cap_a, big_cap, capacity, res, cts
):
    """Segmented reduction of dup-slot cotangents onto Gaussians.

    Sort the cotangent ROWS as payloads keyed by gaussian id (invalid and
    padding slots carry the sentinel id n and sort last), run the
    log2(tile_cap)-step shift-and-add suffix scan inside segments, then one
    start-position gather. f32 throughout (each segment has <= tile_cap
    terms)."""
    gid_s, counts_culled, grads_exact, rows = res
    ct = cts[0]  # only dup_data's cotangent is nonzero
    rows_pad, d = ct.shape
    n = counts_culled.shape[0]
    # Only the live rows carry cotangents (the kernel zero-pads the rest).
    srt = jax.lax.sort(
        (gid_s,) + tuple(ct[r] for r in range(rows)),
        dimension=0, num_keys=1, is_stable=False,
    )
    gid_sorted = srt[0]
    y = jnp.stack(srt[1:])  # (rows, D)
    sh = 1
    while sh < tile_cap:
        y_next = jnp.pad(y[:, sh:], ((0, 0), (0, sh)))
        g_next = jnp.pad(gid_sorted[sh:], (0, sh), constant_values=-1)
        y = y + jnp.where((g_next == gid_sorted)[None, :], y_next, 0.0)
        sh *= 2
    starts = jnp.cumsum(counts_culled, dtype=jnp.int32) - counts_culled
    ok = grads_exact & (counts_culled > 0)
    d_packed = jnp.where(ok[None, :], y[:, jnp.minimum(starts, d - 1)], 0.0)
    return (d_packed, None, None, None, None, None)


dup_sort.defvjp(_dup_sort_fwd, _dup_sort_bwd)


def pack_params(mean, conic, opac, color):
    """(N,2),(N,3),(N,),(N,CH) -> packed (6+CH, N). Differentiable."""
    return jnp.concatenate([mean.T, conic.T, opac[None, :], color.T], axis=0)


def render_fused(
    prep: Preprocessed,
    settings: rc.RasterSettings,
    tile_cap: int,
    capacity: int,
    max_per_tile: int = 8192,
    cap_a: int = 4,
    big_cap: int | None = None,
) -> dict:
    """Production render: fused binning/layout sort + Pallas compositing.

    ``cap_a``/``big_cap`` size the bucketed expansion (see module
    docstring); ``big_cap`` defaults to n for small scenes (lossless) and
    n // 8 at scale — overflow is reported in ``bin_overflow`` and handled
    by the auto-grow protocol (raster.adaptive) like every other capacity.
    """
    tx_n, ty_n = settings.tiles_x, settings.tiles_y
    num_tiles = tx_n * ty_n
    ch = prep.color.shape[-1]
    n = prep.mean2d.shape[0]
    if big_cap is None:
        big_cap = n if n < 65536 else max(n // 8, 65536)
    max_chunks = max(1, (max_per_tile + C_CHUNK - 1) // C_CHUNK)

    packed = pack_params(prep.mean2d, prep.conic, prep.opacity, prep.color)
    (dup_data, _gid, tile_start, tile_count, _counts, num_rendered,
     overflow, _inexact) = dup_sort(
        packed,
        jax.lax.stop_gradient(prep.depth),
        prep.rect_min,
        prep.rect_max,
        prep.tiles_touched,
        jax.lax.stop_gradient(packed),
        num_tiles, tx_n, tile_cap, cap_a, big_cap, capacity,
    )

    count_clip = jnp.minimum(tile_count, max_chunks * C_CHUNK)
    shape_info = (tx_n, num_tiles, ch, max_chunks)
    img_t, final_t, n_contrib = tile_composite(
        shape_info, tile_start, count_clip, dup_data, settings.bg
    )

    def assemble(x, c):
        x = x.reshape(ty_n, tx_n, rc.TILE_Y, rc.TILE_X, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(ty_n * rc.TILE_Y, tx_n * rc.TILE_X, c)
        return x[: settings.image_height, : settings.image_width]

    image = assemble(img_t, ch)
    final_t = assemble(final_t[..., None], 1)[..., 0]
    n_contrib = assemble(n_contrib[..., None], 1)[..., 0]
    max_tile_count = jnp.max(tile_count)
    return dict(
        image=image,
        final_T=final_t,
        n_contrib=n_contrib,
        tile_overflow=jnp.maximum(max_tile_count - max_chunks * C_CHUNK, 0),
        max_tile_count=max_tile_count,
        bin_overflow=overflow,
        num_rendered=num_rendered,
        cap_overflow=jnp.maximum(num_rendered - capacity, 0),
        max_tiles_touched=jnp.max(prep.tiles_touched),
    )
