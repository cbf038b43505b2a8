"""Pallas TPU kernel for per-tile alpha compositing (forward + custom VJP).

Production replacement for the dense pure-JAX ``raster.tiled`` path: the
host pre-gathers Gaussian data into *duplication order* (one contiguous
column per [tile|depth]-sorted dup slot, binning.py + the aligned re-layout
of pallas_render), and each grid program walks its tile's contiguous
[start, start+count) range in C_CHUNK pieces:

  HBM packed dup array --async DMA--> VMEM chunk -> (P x C) alpha on the
  VPU -> log-space transmittance scan (triangular-ones matmuls on the MXU;
  Mosaic has no cumsum primitive) -> (P, C) @ (C, CH) color matmul.

Memory layout: ALL per-Gaussian components live in ONE packed array of shape
(ROWS, D) — rows 0:2 mean2d, 2:5 conic, 5 opacity, 6:6+CH color, padded to
ROWS=16 so sublane tiling divides the DMA shape; the dup axis rides the
128-lane dimension and chunk offsets are C_CHUNK-aligned (host guarantees,
pl.multiple_of informs the compiler). One DMA per chunk, double-buffered.

Early termination: the chunk loop is a lax.while_loop that stops when every
pixel's raw transmittance product falls below T_EPS — the chunk-level analog
of the CUDA per-pixel ``done`` flag (forward.cu:256-261); within a chunk the
inclusion mask reproduces it exactly (see raster.composite).

Backward (same grid): the forward kernel RECORDS each chunk's entry state
(per-pixel log transmittance / log raw product) plus the chunk count, so
the backward walks the chunks once, in reverse, computing

  dL/dalpha_i = (c_i . g) T_i  -  (S_i + T_fin * gt) / (1 - alpha_i)

with S_i the running suffix of w_j (c_j . g) and gt the merged cotangent of
the background term and the final_T output — the vectorized equivalent of
the CUDA back-to-front walk (backward.cu:441-554). Per-dup-slot gradients go
to disjoint contiguous ranges of a packed gradient array (no atomics;
SURVEY.md §7 hard part #2); pallas_render.gather_dup's sort-based segmented
reduction folds them onto Gaussians.

Gradient conventions match CUDA: straight-through 0.99 alpha clamp, hard
1/255 cutoff, no gradient through the T_EPS stop.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sugar_tpu.raster import common as rc

C_CHUNK = 256  # gaussians per DMA'd chunk (2 x 128 lanes)
ROWS = 16  # packed component rows (sublane-tiling aligned)
LOG_T_EPS = math.log(rc.T_EPS)
P_TILE = rc.TILE_X * rc.TILE_Y

# Packed row indices.
R_MX, R_MY = 0, 1
R_CA, R_CB, R_CC = 2, 3, 4
R_OP = 5
R_COL = 6  # 6 .. 6+CH


CUMSUM_IMPL = "scan"  # "scan" (Hillis-Steele rolls, VPU) or "matmul" (MXU)


def _cumsum1(x):
    """Inclusive cumulative sum along axis 1 of (P, C_CHUNK).

    Mosaic has no cumsum primitive. Two formulations:
    - "scan": log2(C) Hillis-Steele steps with lane rolls — O(C log C) VPU
      work, avoids fp32 MXU passes;
    - "matmul": x @ upper-triangular ones on the MXU.
    """
    if CUMSUM_IMPL == "scan":
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        y = x
        sh = 1
        while sh < C_CHUNK:
            rolled = pltpu.roll(y, sh, 1)
            y = y + jnp.where(col >= sh, rolled, 0.0)
            sh *= 2
        return y
    row = jax.lax.broadcasted_iota(jnp.int32, (C_CHUNK, C_CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C_CHUNK, C_CHUNK), 1)
    upper = (row <= col).astype(jnp.float32)
    return jax.lax.dot_general(
        x, upper, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _suffix1(x):
    """Strict suffix sum along axis 1: out[:, i] = sum_{j>i} x[:, j]."""
    return jnp.sum(x, axis=1, keepdims=True) - _cumsum1(x)


def _pixel_coords(i, tiles_x):
    """(P, 1) float pixel x / y coords for tile index i."""
    tx = i % tiles_x
    ty = i // tiles_x
    lin = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, 1), 0)
    px = (tx * rc.TILE_X + lin % rc.TILE_X).astype(jnp.float32)
    py = (ty * rc.TILE_Y + lin // rc.TILE_X).astype(jnp.float32)
    return px, py


def _chunk_alpha(data_s, px, py, base, count):
    """(alpha (P, C) gated, raw, power) for one packed chunk (ROWS, C)."""
    dx = data_s[R_MX : R_MX + 1, :] - px  # (P, C)
    dy = data_s[R_MY : R_MY + 1, :] - py
    a = data_s[R_CA : R_CA + 1, :]
    b = data_s[R_CB : R_CB + 1, :]
    cc = data_s[R_CC : R_CC + 1, :]
    power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
    raw = data_s[R_OP : R_OP + 1, :] * jnp.exp(power)
    alpha = jnp.minimum(rc.ALPHA_CLAMP, raw)
    slot = base + jax.lax.broadcasted_iota(jnp.int32, (1, C_CHUNK), 1)
    keep = (power <= 0.0) & (alpha >= rc.ALPHA_CUTOFF) & (slot < count)
    return jnp.where(keep, alpha, 0.0), raw, power


def _dma_start(offs, data_ref, data_s_slot, sem_slot):
    offs = pl.multiple_of(offs, C_CHUNK)
    pltpu.make_async_copy(
        data_ref.at[:, pl.ds(offs, C_CHUNK)], data_s_slot, sem_slot
    ).start()


def _dma_wait(offs, data_ref, data_s_slot, sem_slot):
    offs = pl.multiple_of(offs, C_CHUNK)
    pltpu.make_async_copy(
        data_ref.at[:, pl.ds(offs, C_CHUNK)], data_s_slot, sem_slot
    ).wait()


def _fwd_kernel(
    start_ref, count_ref,
    data_ref,
    img_ref, t_ref, n_ref, entry_t_ref, entry_p_ref, nch_ref,
    data_s, sem,
    *, tiles_x: int, ch: int, max_chunks: int,
):
    i = pl.program_id(0)
    start = start_ref[i]
    count = count_ref[i]
    px, py = _pixel_coords(i, tiles_x)

    def cond(carry):
        c_idx, log_t, log_p, acc, ninc = carry
        return (
            (c_idx < max_chunks)
            & (c_idx * C_CHUNK < count)
            & (jnp.max(log_p) >= LOG_T_EPS)
        )

    def body(carry):
        c_idx, log_t, log_p, acc, ninc = carry
        slot = jax.lax.rem(c_idx, 2)
        # Record chunk entry state for the backward pass.
        entry_t_ref[0, pl.ds(c_idx, 1), :] = log_t.reshape(1, P_TILE)
        entry_p_ref[0, pl.ds(c_idx, 1), :] = log_p.reshape(1, P_TILE)
        # Wait for this chunk's prefetched DMA, immediately prefetch next.
        _dma_wait(start + c_idx * C_CHUNK, data_ref, data_s.at[slot], sem.at[slot])

        @pl.when((c_idx + 1) * C_CHUNK < count)
        def _():
            _dma_start(
                start + (c_idx + 1) * C_CHUNK, data_ref,
                data_s.at[1 - slot], sem.at[1 - slot],
            )

        base = c_idx * C_CHUNK
        alpha, _, _ = _chunk_alpha(data_s[slot], px, py, base, count)
        lp = jnp.log1p(-alpha)  # (P, C)
        include = (log_p + _cumsum1(lp)) >= LOG_T_EPS
        a_eff = alpha * include.astype(jnp.float32)
        lp_eff = jnp.log1p(-a_eff)
        log_t_in = log_t + _cumsum1(lp_eff) - lp_eff
        w = a_eff * jnp.exp(log_t_in)  # (P, C)
        color = data_s[slot, R_COL : R_COL + ch, :]  # (CH, C)
        contrib = jax.lax.dot_general(
            w, color, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, CH)
        return (
            c_idx + 1,
            log_t + jnp.sum(lp_eff, axis=1, keepdims=True),
            log_p + jnp.sum(lp, axis=1, keepdims=True),
            acc + contrib,
            ninc + jnp.sum((a_eff > 0).astype(jnp.int32), axis=1, keepdims=True),
        )

    # Prefetch the first chunk, then loop with double buffering.
    @pl.when(count > 0)
    def _():
        _dma_start(start, data_ref, data_s.at[0], sem.at[0])

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((P_TILE, 1), jnp.float32),
        jnp.zeros((P_TILE, 1), jnp.float32),
        jnp.zeros((P_TILE, ch), jnp.float32),
        jnp.zeros((P_TILE, 1), jnp.int32),
    )
    c_exit, log_t, _, acc, ninc = jax.lax.while_loop(cond, body, init)

    # Drain a prefetched-but-unconsumed DMA when the transmittance early-exit
    # fired with more chunks remaining (semaphores must be balanced).
    @pl.when((c_exit < max_chunks) & (c_exit * C_CHUNK < count))
    def _():
        slot = jax.lax.rem(c_exit, 2)
        _dma_wait(start + c_exit * C_CHUNK, data_ref, data_s.at[slot], sem.at[slot])

    img_ref[0] = acc
    t_ref[0] = jnp.exp(log_t)
    n_ref[0] = ninc
    # Lane-replicated scalar: (1,1,128) int32 blocks satisfy Mosaic tiling
    # (SMEM outputs / sub-lane blocks do not lower on hardware).
    nch_ref[0] = jnp.full((1, 128), c_exit, jnp.int32)


def _bwd_kernel(
    start_ref, count_ref, nch_ref,
    data_ref,
    g_ref, gt_ref, tfin_ref, entry_t_ref, entry_p_ref,
    dgrad_hbm,
    data_s, dgrad_s,
    sem, wsem,
    *, tiles_x: int, ch: int, max_chunks: int,
):
    i = pl.program_id(0)
    start = start_ref[i]
    count = count_ref[i]
    px, py = _pixel_coords(i, tiles_x)
    g = g_ref[0]  # (P, CH)
    gt = gt_ref[0]  # (P, 1)
    t_fin = tfin_ref[0]  # (P, 1)
    n_chunks = nch_ref[i]  # scalar prefetch: chunks the forward processed

    # Reverse walk over the FULL processed range (chunks beyond the early
    # exit get explicit zeros so the grad buffer holds no garbage), with
    # double-buffered input DMA and async grad write-back.
    all_chunks = jnp.minimum(pl.cdiv(count, C_CHUNK), max_chunks)

    def chunk_off(k):
        # k-th reverse step processes chunk index all_chunks - 1 - k.
        return start + (all_chunks - 1 - k) * C_CHUNK

    @pl.when(all_chunks > 0)
    def _():
        _dma_start(chunk_off(0), data_ref, data_s.at[0], sem.at[0])

    def b_body(k, sdotg_in):
        c_idx = all_chunks - 1 - k
        slot = jax.lax.rem(k, 2)
        _dma_wait(chunk_off(k), data_ref, data_s.at[slot], sem.at[slot])

        @pl.when(k + 1 < all_chunks)
        def _():
            _dma_start(chunk_off(k + 1), data_ref, data_s.at[1 - slot], sem.at[1 - slot])

        beyond = c_idx >= n_chunks
        offs = pl.multiple_of(start + c_idx * C_CHUNK, C_CHUNK)
        base = c_idx * C_CHUNK
        idx_safe = jnp.clip(c_idx, 0, max_chunks - 1)
        log_t = jnp.where(
            beyond, 0.0, entry_t_ref[0, pl.ds(idx_safe, 1), :].reshape(P_TILE, 1)
        )
        log_p = jnp.where(
            beyond, 0.0, entry_p_ref[0, pl.ds(idx_safe, 1), :].reshape(P_TILE, 1)
        )
        alpha, raw, power = _chunk_alpha(data_s[slot], px, py, base, count)
        alpha = jnp.where(beyond, 0.0, alpha)
        lp = jnp.log1p(-alpha)
        include = (log_p + _cumsum1(lp)) >= LOG_T_EPS
        a_eff = alpha * include.astype(jnp.float32)
        lp_eff = jnp.log1p(-a_eff)
        log_t_in = log_t + _cumsum1(lp_eff) - lp_eff
        t_in = jnp.exp(log_t_in)  # (P, C)
        w = a_eff * t_in
        color = data_s[slot, R_COL : R_COL + ch, :]  # (CH, C)
        cdotg = jax.lax.dot_general(
            g, color, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, C)
        wc = w * cdotg
        suffix = _suffix1(wc) + sdotg_in
        one_m_a = jnp.maximum(1.0 - a_eff, 1.0 - rc.ALPHA_CLAMP)
        active = (a_eff > 0.0).astype(jnp.float32)
        dalpha = (t_in * cdotg - suffix / one_m_a) * active  # (P, C)

        # Wait for the grad write of two iterations ago before overwriting
        # this slot's scratch (write DMA from slot `slot` was started at
        # iteration k - 2, same parity).
        @pl.when(k >= 2)
        def _():
            pltpu.make_async_copy(
                dgrad_s.at[slot],
                dgrad_hbm.at[:, pl.ds(pl.multiple_of(chunk_off(k - 2), C_CHUNK), C_CHUNK)],
                wsem.at[slot],
            ).wait()

        # color grad (CH, C) = g^T @ w.
        dgrad_s[slot, R_COL : R_COL + ch, :] = jax.lax.dot_general(
            g, w, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dgrad_s[slot, R_OP : R_OP + 1, :] = jnp.sum(
            dalpha * jnp.exp(power), axis=0, keepdims=True
        )
        dpower = dalpha * raw  # (P, C)
        dx = data_s[slot, R_MX : R_MX + 1, :] - px
        dy = data_s[slot, R_MY : R_MY + 1, :] - py
        a_c = data_s[slot, R_CA : R_CA + 1, :]
        b_c = data_s[slot, R_CB : R_CB + 1, :]
        c_c = data_s[slot, R_CC : R_CC + 1, :]
        # power = -0.5(a dx^2 + c dy^2) - b dx dy, d = mean - pix.
        dgrad_s[slot, R_MX : R_MX + 1, :] = jnp.sum(
            dpower * -(a_c * dx + b_c * dy), axis=0, keepdims=True
        )
        dgrad_s[slot, R_MY : R_MY + 1, :] = jnp.sum(
            dpower * -(c_c * dy + b_c * dx), axis=0, keepdims=True
        )
        dgrad_s[slot, R_CA : R_CA + 1, :] = jnp.sum(
            dpower * (-0.5 * dx * dx), axis=0, keepdims=True
        )
        dgrad_s[slot, R_CB : R_CB + 1, :] = jnp.sum(
            dpower * -(dx * dy), axis=0, keepdims=True
        )
        dgrad_s[slot, R_CC : R_CC + 1, :] = jnp.sum(
            dpower * (-0.5 * dy * dy), axis=0, keepdims=True
        )
        dgrad_s[slot, R_COL + ch :, :] = jnp.zeros(
            (ROWS - R_COL - ch, C_CHUNK), jnp.float32
        )

        pltpu.make_async_copy(
            dgrad_s.at[slot], dgrad_hbm.at[:, pl.ds(offs, C_CHUNK)], wsem.at[slot]
        ).start()
        return sdotg_in + jnp.sum(wc, axis=1, keepdims=True)

    jax.lax.fori_loop(0, all_chunks, b_body, t_fin * gt)

    # Drain the last (up to two) outstanding grad writes.
    def drain(k):
        @pl.when((k >= 0) & (k < all_chunks))
        def _():
            slot = jax.lax.rem(k, 2)
            pltpu.make_async_copy(
                dgrad_s.at[slot],
                dgrad_hbm.at[:, pl.ds(pl.multiple_of(chunk_off(k), C_CHUNK), C_CHUNK)],
                wsem.at[slot],
            ).wait()

    drain(all_chunks - 1)
    drain(all_chunks - 2)


def _make_fwd(tiles_x, num_tiles, ch, max_chunks):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((1, P_TILE, ch), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_TILE, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_TILE, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max_chunks, P_TILE), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max_chunks, P_TILE), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, C_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x, ch=ch, max_chunks=max_chunks),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, P_TILE, ch), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, P_TILE, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, P_TILE, 1), jnp.int32),
            jax.ShapeDtypeStruct((num_tiles, max_chunks, P_TILE), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, max_chunks, P_TILE), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, 128), jnp.int32),
        ],
    )


def _make_bwd(tiles_x, num_tiles, ch, max_chunks, capacity_pad):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, P_TILE, ch), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_TILE, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_TILE, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max_chunks, P_TILE), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max_chunks, P_TILE), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, C_CHUNK), jnp.float32),
            pltpu.VMEM((2, ROWS, C_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x, ch=ch, max_chunks=max_chunks),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ROWS, capacity_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def tile_composite(
    shape_info: tuple,  # (tiles_x, num_tiles, ch, max_chunks)
    tile_start: jnp.ndarray,  # (T,) int32, C_CHUNK-aligned
    tile_count: jnp.ndarray,  # (T,) int32 (clipped to max_chunks * C_CHUNK)
    slot_mask: jnp.ndarray,  # (1, D) f32: 1 for owned slots
    dup_data: jnp.ndarray,  # (ROWS, D) packed component-major dup order
    bg: jnp.ndarray,  # (CH,)
):
    """Returns (tile images (T, P, CH), final_T (T, P), n_contrib (T, P))."""
    out, _ = _tile_composite_fwd(
        shape_info, tile_start, tile_count, slot_mask, dup_data, bg
    )
    return out


def _tile_composite_fwd(shape_info, tile_start, tile_count, slot_mask, dup_data, bg):
    tiles_x, num_tiles, ch, max_chunks = shape_info
    fwd = _make_fwd(tiles_x, num_tiles, ch, max_chunks)
    img, t_fin, ninc, entry_t, entry_p, nch = fwd(tile_start, tile_count, dup_data)
    t_fin2 = t_fin[..., 0]  # (T, P)
    image = img + t_fin2[:, :, None] * bg[None, None, :]
    res = (
        tile_start, tile_count, slot_mask, dup_data, bg, t_fin,
        entry_t, entry_p, nch[:, 0, 0],
    )
    return (image, t_fin2, ninc[..., 0]), res


def _tile_composite_bwd(shape_info, res, cot):
    tiles_x, num_tiles, ch, max_chunks = shape_info
    (tile_start, tile_count, slot_mask, dup_data, bg, t_fin,
     entry_t, entry_p, nch) = res
    g_img, g_t, _g_n = cot
    gt_total = g_t + jnp.einsum("tpc,c->tp", g_img, bg)
    d_bg = jnp.einsum("tp,tpc->c", t_fin[..., 0], g_img)
    bwd = _make_bwd(tiles_x, num_tiles, ch, max_chunks, dup_data.shape[1])
    (d_packed,) = bwd(
        tile_start, tile_count, nch, dup_data,
        g_img, gt_total[..., None], t_fin, entry_t, entry_p,
    )
    # Zero dup slots the kernel never wrote (padding); jnp.where, not
    # multiply — unwritten columns may hold NaN garbage.
    d_packed = jnp.where(slot_mask > 0, d_packed, 0.0)
    return (None, None, None, d_packed, d_bg)


tile_composite.defvjp(_tile_composite_fwd, _tile_composite_bwd)
