"""Fused binning for the production Pallas render path.

Replaces ``bin_gaussians_dense`` with a bucketed, exact-support-culled
expansion whose [tile | depth-rank] sort carries only (key, gaussian id).
Design is driven by measured v5e costs (PERF.md):

- ``lax.sort`` costs scale with elements x CONSUMED operands (~0.8 ms per
  operand-5.5M); column gathers cost ~9 ns per *lookup* independent of row
  width. So the cheapest layout pipeline is: small-operand sort over a
  small expansion, then ONE wide column gather (pallas_render.gather_dup)
  of the packed render data into dup order.
- The dense (N, tile_cap) expansion sorted 16M slots for ~2.1M real dups.
  Here the expansion is BUCKETED: every Gaussian owns a width-``cap_a``
  row (covers 97%+ of real scenes' rects) and the few Gaussians whose rect
  exceeds ``cap_a`` are compacted into ``big_cap`` extra rows of width
  ``tile_cap - cap_a`` — 16M slots become ~4.8M at bench scale.
- Exact-support culling: a tile in a Gaussian's bounding rect whose pixels
  ALL have alpha < ALPHA_CUTOFF can never contribute to the forward image
  nor receive/emit gradients (the compositing kernel's ``keep`` gate zeroes
  such samples; CUDA likewise ``continue``s on alpha < 1/255,
  forward.cu:254). The continuous box-minimum of the conic quadratic
  q(d) = 0.5 a dx^2 + b dx dy + 0.5 c dy^2 lower-bounds the discrete pixel
  minimum, so culling tiles with min_box q > ln(opacity/cutoff) is EXACTLY
  output- and gradient-preserving while dropping ~23% of dup slots (and
  the kernel, gather, and gradient-reduction work they would cost). This
  is strictly tighter than the CUDA rect (auxiliary.h:46-56) at equal
  semantics.
- All (slots, N) expansion math runs with the slot axis LEADING: per-
  Gaussian vectors broadcast along sublanes and flatten as contiguous
  copies; the (N, slots) orientation costs a lane-interleave relayout
  (profiled 19 ms vs ~1 ms at bench scale).

Ordering semantics are identical to the CUDA [tileID | depth] radix sort
(rasterizer_impl.cu:70-138): slots sort by depth rank within a tile, and
equal-depth ties resolve to Gaussian index order (the depth pre-sort is
stable on index).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sugar_tpu.raster import common as rc
from sugar_tpu.raster.pallas_composite import C_CHUNK, tile_composite
from sugar_tpu.raster.pallas_render import gather_dup, pack_params
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

    Uses the f32-divide trick for j // w (int32 div lowers poorly on the
    VPU; exact for j < 2^24)."""
    ty_off = jnp.floor(j.astype(jnp.float32) / rect_w.astype(jnp.float32)).astype(
        jnp.int32
    )
    tx_off = j - ty_off * rect_w
    return rmin_x + tx_off, rmin_y + ty_off


def _slot_valid(tx, ty, j, counts, mx, my, ca, cb, cc, qmax):
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


def expand_support_culled(
    prep: Preprocessed,
    num_tiles: int,
    tiles_x: int,
    tile_cap: int,
    cap_a: int,
    big_cap: int,
    payload: jnp.ndarray,  # (N,) float32 per-Gaussian sort payload
):
    """Bucketed, exact-support-culled dup expansion (see module docstring).

    Shared by the single-chip fused path (payload = depth rank) and the
    multi-chip tile-sharded path (payload = float depth, parallel/render).
    Returns (tile_e, pay_e, gid_e (E,), counts_culled (N,), num_rendered (),
    big_overflow ()) with sentinel tile = num_tiles / gid = n on invalid
    slots. ``payload`` must be exactly representable in f32 (it round-trips
    the bucket-B compaction stack)."""
    n = prep.tiles_touched.shape[0]
    # Integer fields round-trip through an f32 stack (bucket-B compaction)
    # and _slot_tiles uses an f32 divide: both exact only below 2^24.
    assert n < 2**24, f"fused binning supports < 2^24 Gaussians, got {n}"
    cap_a = min(cap_a, tile_cap)
    big_cap = min(big_cap, n)
    cap_b = tile_cap - cap_a

    mean2d = prep.mean2d
    conic = prep.conic
    mx, my = mean2d[:, 0], mean2d[:, 1]
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    qmax = jnp.log(jnp.maximum(prep.opacity, 1e-30) / rc.ALPHA_CUTOFF)
    counts = jnp.minimum(prep.tiles_touched, tile_cap).astype(jnp.int32)
    rmin_x, rmin_y = prep.rect_min[:, 0], prep.rect_min[:, 1]
    rect_w = jnp.maximum(prep.rect_max[:, 0] - rmin_x, 1)
    iota = jnp.arange(n, dtype=jnp.int32)

    # --- exact-support validity over the FULL capped rect, original order:
    # per-Gaussian culled counts = the backward's exact segment sizes.
    j_full = jnp.arange(tile_cap, dtype=jnp.int32)[:, None]
    txf, tyf = _slot_tiles(rmin_x[None, :], rmin_y[None, :], rect_w[None, :], j_full)
    valid_full = _slot_valid(
        txf, tyf, j_full, counts[None, :], mx[None, :], my[None, :],
        ca[None, :], cb[None, :], cc[None, :], qmax[None, :],
    )
    counts_culled = jnp.sum(valid_full, axis=0, dtype=jnp.int32)
    num_rendered = jnp.sum(counts_culled)

    # --- bucket A: every Gaussian owns cap_a slots (leading slot axis).
    tile_a = jnp.where(
        valid_full[:cap_a], tyf[:cap_a] * tiles_x + txf[:cap_a], num_tiles
    )
    gid_a = jnp.where(valid_full[:cap_a], iota[None, :], n)
    pay_a = jnp.broadcast_to(payload[None, :], (cap_a, n))

    parts_tile = [tile_a.reshape(-1)]
    parts_pay = [pay_a.reshape(-1)]
    parts_gid = [gid_a.reshape(-1)]

    big_overflow = jnp.zeros((), jnp.int32)
    if cap_b > 0 and big_cap > 0:
        # --- bucket B: Gaussians with rect > cap_a tiles, compacted into
        # big_cap rows: a 2-operand partition sort finds them, then ONE
        # narrow column gather (big_cap lookups, ~free at big_cap << n)
        # pulls their rect/conic rows.
        is_big = counts > cap_a
        bkey = jnp.where(is_big, 0, 1).astype(jnp.int32)
        _, big_iota = jax.lax.sort((bkey, iota), dimension=0, num_keys=1,
                                   is_stable=True)
        b_iota = big_iota[:big_cap]
        brows = jnp.stack(
            [payload, counts.astype(jnp.float32),
             rmin_x.astype(jnp.float32), rmin_y.astype(jnp.float32),
             rect_w.astype(jnp.float32), mx, my, ca, cb, cc, qmax]
        )[:, b_iota]  # (11, big_cap)
        b_pay = brows[0]
        b_counts = brows[1].astype(jnp.int32)
        b_rx = brows[2].astype(jnp.int32)
        b_ry = brows[3].astype(jnp.int32)
        b_rw = brows[4].astype(jnp.int32)
        b_mx, b_my, b_ca, b_cb, b_cc, b_qmax = brows[5:11]
        # Rows beyond the real big count are small Gaussians (counts <=
        # cap_a): their j >= cap_a slots fail the in_rect test => invalid.
        j_b = cap_a + jnp.arange(cap_b, dtype=jnp.int32)[:, None]
        txb, tyb = _slot_tiles(b_rx[None, :], b_ry[None, :], b_rw[None, :], j_b)
        valid_b = _slot_valid(
            txb, tyb, j_b, b_counts[None, :], b_mx[None, :], b_my[None, :],
            b_ca[None, :], b_cb[None, :], b_cc[None, :], b_qmax[None, :],
        )
        parts_tile.append(
            jnp.where(valid_b, tyb * tiles_x + txb, num_tiles).reshape(-1)
        )
        parts_pay.append(
            jnp.broadcast_to(b_pay[None, :], (cap_b, big_cap)).reshape(-1)
        )
        parts_gid.append(jnp.where(valid_b, b_iota[None, :], n).reshape(-1))
        # Big Gaussians that did not fit in big_cap rows lose their j >=
        # cap_a slots: count them (their A slots remain, so counts_culled
        # no longer matches the emitted multiset -> grads inexact).
        # Kept rows beyond the true big count are small Gaussians whose
        # excess-over-cap_a is 0, so the difference needs no masking.
        excess_all = jnp.sum(jnp.maximum(counts - cap_a, 0))
        excess_kept = jnp.sum(jnp.maximum(b_counts - cap_a, 0))
        big_overflow = excess_all - excess_kept

    return (
        jnp.concatenate(parts_tile),
        jnp.concatenate(parts_pay),
        jnp.concatenate(parts_gid),
        counts_culled,
        num_rendered,
        big_overflow,
    )


def bin_fused(
    prep: Preprocessed,
    num_tiles: int,
    tiles_x: int,
    tile_cap: int,
    cap_a: int,
    big_cap: int,
    capacity: int,
):
    """Bucketed, support-culled binning. All inputs are treated as
    non-differentiable (the support/order decisions carry no gradient,
    like CUDA's rect) — callers pass stop_gradient'ed prep fields.

    Returns dict(gid (D_pad,), tile_start (T,), tile_count (T,),
    counts_culled (N,), num_rendered (), overflow (), inexact ()) where
    D_pad is the chunk-aligned capacity and ``gid`` holds the sentinel n
    for invalid/padding slots. ``inexact`` counts dup slots dropped by
    big_cap/capacity truncation (nonzero => counts-derived gradient
    segment offsets would be wrong; the gather_dup backward then returns
    zeros and the auto-grow protocol re-renders)."""
    n = prep.tiles_touched.shape[0]
    cap_a = min(cap_a, tile_cap)
    big_cap = min(big_cap, n)

    # --- depth rank per Gaussian (original order): two N-key sorts.
    iota = jnp.arange(n, dtype=jnp.int32)
    _, gsort = jax.lax.sort((prep.depth, iota), dimension=0, num_keys=1,
                            is_stable=True)
    _, rank = jax.lax.sort((gsort, iota), dimension=0, num_keys=1,
                           is_stable=False)

    tile_e, pay_e, gid_e, counts_culled, num_rendered, big_overflow = (
        expand_support_culled(
            prep, num_tiles, tiles_x, tile_cap, cap_a, big_cap,
            rank.astype(jnp.float32),
        )
    )
    rank_e = pay_e.astype(jnp.int32)

    # --- THE sort: [tile | depth-rank] fused into one unique int32 key
    # when the bits fit, else two int keys; (tile, rank) pairs are unique
    # either way, so an unstable sort is exact.
    rank_bits = max(1, (n - 1).bit_length())
    if (num_tiles + 1) << rank_bits < 2**31:
        key_e = (tile_e << rank_bits) | rank_e
        sorted_key, gid_s = jax.lax.sort(
            (key_e, gid_e), dimension=0, num_keys=1, is_stable=False
        )
        sorted_tile = sorted_key >> rank_bits
    else:
        sorted_tile, _, gid_s = jax.lax.sort(
            (tile_e, rank_e, gid_e), dimension=0, num_keys=2, is_stable=False
        )

    # --- truncate to the chunk-aligned capacity (valid slots sort first).
    d_pad = ((capacity + C_CHUNK - 1) // C_CHUNK) * C_CHUNK + C_CHUNK
    e_total = tile_e.shape[0]
    if e_total < d_pad:
        pad = d_pad - e_total
        sorted_tile = jnp.concatenate(
            [sorted_tile, jnp.full((pad,), num_tiles, jnp.int32)]
        )
        gid_s = jnp.concatenate([gid_s, jnp.full((pad,), n, jnp.int32)])
    else:
        sorted_tile = sorted_tile[:d_pad]
        gid_s = gid_s[:d_pad]

    # --- per-tile ranges (tiny query side: binary-search lowering).
    bounds = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start = bounds[:num_tiles]
    tile_count = bounds[1:] - bounds[:num_tiles]

    rect_overflow = jnp.sum(jnp.maximum(prep.tiles_touched - tile_cap, 0))
    cap_overflow = jnp.maximum(num_rendered - capacity, 0)
    return dict(
        gid=gid_s,
        tile_start=tile_start,
        tile_count=tile_count,
        counts_culled=counts_culled,
        num_rendered=num_rendered,
        overflow=rect_overflow + big_overflow + cap_overflow,
        inexact=big_overflow + cap_overflow,
        big_overflow=big_overflow,
        num_big=jnp.sum(
            (jnp.minimum(prep.tiles_touched, tile_cap) > cap_a).astype(jnp.int32)
        ),
    )


def render_fused(
    prep: Preprocessed,
    settings: rc.RasterSettings,
    tile_cap: int,
    capacity: int,
    max_per_tile: int = 8192,
    cap_a: int = 4,
    big_cap: int | None = None,
) -> dict:
    """Production render: fused binning + gather_dup layout + Pallas
    compositing.

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

    b = bin_fused(
        jax.lax.stop_gradient(prep), num_tiles, tx_n, tile_cap, cap_a,
        big_cap, capacity,
    )
    grads_exact = b["inexact"] == 0

    # ONE wide column gather of the packed render data into dup order;
    # rows are pre-padded to the Mosaic-aligned 8-multiple so the gather
    # output is the kernel's dup_data directly (row width is free in the
    # gather; a post-gather pad row copy is not).
    packed = pack_params(prep.mean2d, prep.conic, prep.opacity, prep.color)
    rows_pad = _round8(6 + ch)
    packed_pad = jnp.concatenate(
        [packed, jnp.zeros((rows_pad - 6 - ch, n), jnp.float32)], axis=0
    )
    dup_data = gather_dup(
        packed_pad, b["gid"], b["counts_culled"], grads_exact, n,
        6 + ch, tile_cap,
    )

    count_clip = jnp.minimum(b["tile_count"], max_chunks * C_CHUNK)
    shape_info = (tx_n, num_tiles, ch, max_chunks)
    img_t, final_t, n_contrib = tile_composite(
        shape_info, b["tile_start"], count_clip, dup_data, settings.bg
    )

    def assemble(x, c):
        x = x.reshape(ty_n, tx_n, rc.TILE_Y, rc.TILE_X, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(ty_n * rc.TILE_Y, tx_n * rc.TILE_X, c)
        return x[: settings.image_height, : settings.image_width]

    image = assemble(img_t, ch)
    final_t = assemble(final_t[..., None], 1)[..., 0]
    n_contrib = assemble(n_contrib[..., None], 1)[..., 0]
    max_tile_count = jnp.max(b["tile_count"])
    return dict(
        image=image,
        final_T=final_t,
        n_contrib=n_contrib,
        tile_overflow=jnp.maximum(max_tile_count - max_chunks * C_CHUNK, 0),
        max_tile_count=max_tile_count,
        bin_overflow=b["overflow"],
        big_overflow=b["big_overflow"],
        num_big=b["num_big"],
        num_rendered=b["num_rendered"],
        cap_overflow=jnp.maximum(b["num_rendered"] - capacity, 0),
        max_tiles_touched=jnp.max(prep.tiles_touched),
    )
