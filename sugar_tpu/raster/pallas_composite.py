"""Pallas TPU kernel for per-tile alpha compositing (forward + custom VJP).

Production replacement for the dense pure-JAX ``raster.tiled`` path: the
host pre-gathers Gaussian data into *duplication order* (one contiguous
column per [tile|depth]-sorted dup slot, binning.py), and each grid program
walks its tile's contiguous [start, start+count) range in C_CHUNK pieces:

  HBM dup arrays --async DMA--> VMEM chunk -> (P x C) alpha on the VPU ->
  log-space transmittance scan (triangular-ones matmuls on the MXU; Mosaic
  has no cumsum primitive) -> (P, C) @ (C, CH) color matmul on the MXU.

Memory layout: dup arrays are stored component-major, shape (comp, D) — the
dup axis rides the 128-lane dimension, so chunk DMAs slice lane-aligned
(comp, 256) blocks. All in-kernel tensors are (P=256 pixels, C=256 chunk)
or (comp, C) rows.

Early termination: the chunk loop is a lax.while_loop that stops when every
pixel's raw transmittance product falls below T_EPS — the chunk-level analog
of the CUDA per-pixel ``done`` flag (forward.cu:256-261); within a chunk the
inclusion mask reproduces it exactly (see raster.composite).

Backward (same grid): a forward sweep records each chunk's entry state in
VMEM, then chunks are re-walked in reverse computing

  dL/dalpha_i = (c_i . g) T_i  -  (S_i + T_fin * gt) / (1 - alpha_i)

with S_i the running suffix of w_j (c_j . g) and gt the merged cotangent of
the background term and the final_T output — the vectorized equivalent of
the CUDA back-to-front walk (backward.cu:441-554). Per-dup-slot gradients go
to disjoint contiguous ranges (no atomics; SURVEY.md §7 hard part #2); the
transpose of the host-side pre-gather (an XLA scatter-add) reduces them onto
Gaussians.

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
LOG_T_EPS = math.log(rc.T_EPS)
P_TILE = rc.TILE_X * rc.TILE_Y


def _cumsum1(x):
    """Inclusive cumulative sum along axis 1 of (P, C_CHUNK): x @ U with
    U[j, i] = 1 for j <= i. MXU matmul (no cumsum primitive in Mosaic)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (C_CHUNK, C_CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C_CHUNK, C_CHUNK), 1)
    upper = (row <= col).astype(jnp.float32)
    return jax.lax.dot_general(
        x, upper, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _suffix1(x):
    """Strict suffix sum along axis 1: out[:, i] = sum_{j>i} x[:, j]."""
    row = jax.lax.broadcasted_iota(jnp.int32, (C_CHUNK, C_CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C_CHUNK, C_CHUNK), 1)
    lower = (row > col).astype(jnp.float32)
    return jax.lax.dot_general(
        x, lower, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pixel_coords(i, tiles_x):
    """(P, 1) float pixel x / y coords for tile index i."""
    tx = i % tiles_x
    ty = i // tiles_x
    lin = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, 1), 0)
    px = (tx * rc.TILE_X + lin % rc.TILE_X).astype(jnp.float32)
    py = (ty * rc.TILE_Y + lin // rc.TILE_X).astype(jnp.float32)
    return px, py


def _chunk_alpha(mean_s, conic_s, opac_s, px, py, base, count):
    """(alpha (P, C) gated, raw, power) for one chunk. mean_s (2, C),
    conic_s (3, C), opac_s (1, C)."""
    dx = mean_s[0:1, :] - px  # (P, C)
    dy = mean_s[1:2, :] - py
    a = conic_s[0:1, :]
    b = conic_s[1:2, :]
    cc = conic_s[2:3, :]
    power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
    raw = opac_s[0:1, :] * jnp.exp(power)
    alpha = jnp.minimum(rc.ALPHA_CLAMP, raw)
    slot = base + jax.lax.broadcasted_iota(jnp.int32, (1, C_CHUNK), 1)
    keep = (power <= 0.0) & (alpha >= rc.ALPHA_CUTOFF) & (slot < count)
    return jnp.where(keep, alpha, 0.0), raw, power


def _dma_chunk(offs, mean_ref, conic_ref, opac_ref, color_ref, mean_s, conic_s, opac_s, color_s, sem):
    cps = [
        pltpu.make_async_copy(mean_ref.at[:, pl.ds(offs, C_CHUNK)], mean_s, sem.at[0]),
        pltpu.make_async_copy(conic_ref.at[:, pl.ds(offs, C_CHUNK)], conic_s, sem.at[1]),
        pltpu.make_async_copy(opac_ref.at[:, pl.ds(offs, C_CHUNK)], opac_s, sem.at[2]),
        pltpu.make_async_copy(color_ref.at[:, pl.ds(offs, C_CHUNK)], color_s, sem.at[3]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()


def _fwd_kernel(
    start_ref, count_ref,
    mean_ref, conic_ref, opac_ref, color_ref,
    img_ref, t_ref, n_ref,
    mean_s, conic_s, opac_s, color_s, sem,
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
        _dma_chunk(start + c_idx * C_CHUNK, mean_ref, conic_ref, opac_ref,
                   color_ref, mean_s, conic_s, opac_s, color_s, sem)
        base = c_idx * C_CHUNK
        alpha, _, _ = _chunk_alpha(mean_s[:], conic_s[:], opac_s[:], px, py, base, count)
        lp = jnp.log1p(-alpha)  # (P, C)
        include = (log_p + _cumsum1(lp)) >= LOG_T_EPS
        a_eff = alpha * include.astype(jnp.float32)
        lp_eff = jnp.log1p(-a_eff)
        log_t_in = log_t + _cumsum1(lp_eff) - lp_eff
        w = a_eff * jnp.exp(log_t_in)  # (P, C)
        contrib = jax.lax.dot_general(
            w, color_s[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, CH)
        return (
            c_idx + 1,
            log_t + jnp.sum(lp_eff, axis=1, keepdims=True),
            log_p + jnp.sum(lp, axis=1, keepdims=True),
            acc + contrib,
            ninc + jnp.sum((a_eff > 0).astype(jnp.int32), axis=1, keepdims=True),
        )

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((P_TILE, 1), jnp.float32),
        jnp.zeros((P_TILE, 1), jnp.float32),
        jnp.zeros((P_TILE, ch), jnp.float32),
        jnp.zeros((P_TILE, 1), jnp.int32),
    )
    _, log_t, _, acc, ninc = jax.lax.while_loop(cond, body, init)
    img_ref[0] = acc
    t_ref[0] = jnp.exp(log_t)
    n_ref[0] = ninc


def _bwd_kernel(
    start_ref, count_ref,
    mean_ref, conic_ref, opac_ref, color_ref,
    g_ref, gt_ref, tfin_ref,
    dmean_hbm, dconic_hbm, dopac_hbm, dcolor_hbm,
    mean_s, conic_s, opac_s, color_s,
    entry_t, entry_p,
    dmean_s, dconic_s, dopac_s, dcolor_s,
    sem, wsem,
    *, tiles_x: int, ch: int, max_chunks: int,
):
    i = pl.program_id(0)
    start = start_ref[i]
    count = count_ref[i]
    px, py = _pixel_coords(i, tiles_x)
    g = g_ref[0]  # (P, CH)
    gt = gt_ref[0]  # (P, 1): cotangent of final_T + (bg . g)
    t_fin = tfin_ref[0]  # (P, 1)

    # ---- pass 1: forward sweep, record chunk entry states.
    def f_cond(carry):
        c_idx, log_t, log_p = carry
        return (
            (c_idx < max_chunks)
            & (c_idx * C_CHUNK < count)
            & (jnp.max(log_p) >= LOG_T_EPS)
        )

    def f_body(carry):
        c_idx, log_t, log_p = carry
        entry_t[c_idx] = log_t
        entry_p[c_idx] = log_p
        _dma_chunk(start + c_idx * C_CHUNK, mean_ref, conic_ref, opac_ref,
                   color_ref, mean_s, conic_s, opac_s, color_s, sem)
        base = c_idx * C_CHUNK
        alpha, _, _ = _chunk_alpha(mean_s[:], conic_s[:], opac_s[:], px, py, base, count)
        lp = jnp.log1p(-alpha)
        include = (log_p + _cumsum1(lp)) >= LOG_T_EPS
        lp_eff = jnp.log1p(-alpha * include.astype(jnp.float32))
        return (
            c_idx + 1,
            log_t + jnp.sum(lp_eff, axis=1, keepdims=True),
            log_p + jnp.sum(lp, axis=1, keepdims=True),
        )

    n_chunks, _, _ = jax.lax.while_loop(
        f_cond,
        f_body,
        (jnp.zeros((), jnp.int32), jnp.zeros((P_TILE, 1), jnp.float32),
         jnp.zeros((P_TILE, 1), jnp.float32)),
    )

    # ---- pass 2: reverse walk over the FULL processed range. Chunks beyond
    # the early-exit point have exactly-zero gradients but must still be
    # written so the dup-order buffers hold no stale garbage.
    all_chunks = jnp.minimum(pl.cdiv(count, C_CHUNK), max_chunks)

    def b_body(k, sdotg_in):
        c_idx = all_chunks - 1 - k
        beyond = c_idx >= n_chunks
        offs = start + c_idx * C_CHUNK
        _dma_chunk(offs, mean_ref, conic_ref, opac_ref, color_ref,
                   mean_s, conic_s, opac_s, color_s, sem)
        base = c_idx * C_CHUNK
        idx_safe = jnp.clip(c_idx, 0, max_chunks - 1)
        log_t = jnp.where(beyond, 0.0, entry_t[idx_safe])
        log_p = jnp.where(beyond, 0.0, entry_p[idx_safe])
        alpha, raw, power = _chunk_alpha(mean_s[:], conic_s[:], opac_s[:], px, py, base, count)
        alpha = jnp.where(beyond, 0.0, alpha)
        lp = jnp.log1p(-alpha)
        include = (log_p + _cumsum1(lp)) >= LOG_T_EPS
        a_eff = alpha * include.astype(jnp.float32)
        lp_eff = jnp.log1p(-a_eff)
        log_t_in = log_t + _cumsum1(lp_eff) - lp_eff
        t_in = jnp.exp(log_t_in)  # (P, C)
        w = a_eff * t_in
        cdotg = jax.lax.dot_general(
            g, color_s[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, C)
        wc = w * cdotg
        suffix = _suffix1(wc) + sdotg_in
        one_m_a = jnp.maximum(1.0 - a_eff, 1.0 - rc.ALPHA_CLAMP)
        active = (a_eff > 0.0).astype(jnp.float32)
        dalpha = (t_in * cdotg - suffix / one_m_a) * active  # (P, C)

        # color grad (CH, C) = g^T @ w.
        dcolor_s[:] = jax.lax.dot_general(
            g, w, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # alpha -> opacity, power (straight-through clamp).
        dopac_s[:] = jnp.sum(dalpha * jnp.exp(power), axis=0, keepdims=True)
        dpower = dalpha * raw  # (P, C)
        dx = mean_s[0:1, :] - px
        dy = mean_s[1:2, :] - py
        a_c = conic_s[0:1, :]
        b_c = conic_s[1:2, :]
        c_c = conic_s[2:3, :]
        # power = -0.5(a dx^2 + c dy^2) - b dx dy, d = mean - pix.
        dmean_s[0:1, :] = jnp.sum(dpower * -(a_c * dx + b_c * dy), axis=0, keepdims=True)
        dmean_s[1:2, :] = jnp.sum(dpower * -(c_c * dy + b_c * dx), axis=0, keepdims=True)
        dconic_s[0:1, :] = jnp.sum(dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
        dconic_s[1:2, :] = jnp.sum(dpower * -(dx * dy), axis=0, keepdims=True)
        dconic_s[2:3, :] = jnp.sum(dpower * (-0.5 * dy * dy), axis=0, keepdims=True)

        outs = [
            pltpu.make_async_copy(dmean_s, dmean_hbm.at[:, pl.ds(offs, C_CHUNK)], wsem.at[0]),
            pltpu.make_async_copy(dconic_s, dconic_hbm.at[:, pl.ds(offs, C_CHUNK)], wsem.at[1]),
            pltpu.make_async_copy(dopac_s, dopac_hbm.at[:, pl.ds(offs, C_CHUNK)], wsem.at[2]),
            pltpu.make_async_copy(dcolor_s, dcolor_hbm.at[:, pl.ds(offs, C_CHUNK)], wsem.at[3]),
        ]
        for cp in outs:
            cp.start()
        for cp in outs:
            cp.wait()
        return sdotg_in + jnp.sum(wc, axis=1, keepdims=True)

    jax.lax.fori_loop(0, all_chunks, b_body, t_fin * gt)


def _make_fwd(tiles_x, num_tiles, ch, max_chunks):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        out_specs=[
            pl.BlockSpec((1, P_TILE, ch), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_TILE, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_TILE, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, C_CHUNK), jnp.float32),
            pltpu.VMEM((3, C_CHUNK), jnp.float32),
            pltpu.VMEM((1, C_CHUNK), jnp.float32),
            pltpu.VMEM((ch, C_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x, ch=ch, max_chunks=max_chunks),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, P_TILE, ch), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, P_TILE, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, P_TILE, 1), jnp.int32),
        ],
    )


def _make_bwd(tiles_x, num_tiles, ch, max_chunks, capacity_pad):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, P_TILE, ch), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_TILE, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_TILE, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, C_CHUNK), jnp.float32),
            pltpu.VMEM((3, C_CHUNK), jnp.float32),
            pltpu.VMEM((1, C_CHUNK), jnp.float32),
            pltpu.VMEM((ch, C_CHUNK), jnp.float32),
            pltpu.VMEM((max_chunks, P_TILE, 1), jnp.float32),
            pltpu.VMEM((max_chunks, P_TILE, 1), jnp.float32),
            pltpu.VMEM((2, C_CHUNK), jnp.float32),
            pltpu.VMEM((3, C_CHUNK), jnp.float32),
            pltpu.VMEM((1, C_CHUNK), jnp.float32),
            pltpu.VMEM((ch, C_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x, ch=ch, max_chunks=max_chunks),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((2, capacity_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, capacity_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, capacity_pad), jnp.float32),
            jax.ShapeDtypeStruct((ch, capacity_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def tile_composite(
    shape_info: tuple,  # (tiles_x, num_tiles, ch, max_chunks)
    tile_start: jnp.ndarray,  # (T,) int32
    tile_count: jnp.ndarray,  # (T,) int32 (clipped to max_chunks * C_CHUNK)
    slot_mask: jnp.ndarray,  # (1, D) f32: 1 for slots owned by a real tile's
    #                           processed range (zeros stale bwd columns)
    dup_mean: jnp.ndarray,  # (2, D) component-major dup order
    dup_conic: jnp.ndarray,  # (3, D)
    dup_opac: jnp.ndarray,  # (1, D)
    dup_color: jnp.ndarray,  # (CH, D)
    bg: jnp.ndarray,  # (CH,)
):
    """Returns (tile images (T, P, CH), final_T (T, P), n_contrib (T, P))."""
    out, _ = _tile_composite_fwd(
        shape_info, tile_start, tile_count, slot_mask,
        dup_mean, dup_conic, dup_opac, dup_color, bg,
    )
    return out


def _tile_composite_fwd(
    shape_info, tile_start, tile_count, slot_mask, dup_mean, dup_conic, dup_opac, dup_color, bg
):
    tiles_x, num_tiles, ch, max_chunks = shape_info
    fwd = _make_fwd(tiles_x, num_tiles, ch, max_chunks)
    img, t_fin, ninc = fwd(tile_start, tile_count, dup_mean, dup_conic, dup_opac, dup_color)
    t_fin2 = t_fin[..., 0]  # (T, P)
    image = img + t_fin2[:, :, None] * bg[None, None, :]
    res = (tile_start, tile_count, slot_mask, dup_mean, dup_conic, dup_opac, dup_color, bg, t_fin)
    return (image, t_fin2, ninc[..., 0]), res


def _tile_composite_bwd(shape_info, res, cot):
    tiles_x, num_tiles, ch, max_chunks = shape_info
    (tile_start, tile_count, slot_mask, dup_mean, dup_conic, dup_opac,
     dup_color, bg, t_fin) = res
    g_img, g_t, _g_n = cot
    # Merged cotangent of final_T: direct output cotangent + background path.
    gt_total = g_t + jnp.einsum("tpc,c->tp", g_img, bg)
    d_bg = jnp.einsum("tp,tpc->c", t_fin[..., 0], g_img)
    bwd = _make_bwd(tiles_x, num_tiles, ch, max_chunks, dup_mean.shape[1])
    d_mean, d_conic, d_opac, d_color = bwd(
        tile_start,
        tile_count,
        dup_mean,
        dup_conic,
        dup_opac,
        dup_color,
        g_img,
        gt_total[..., None],
        t_fin,
    )
    # Zero dup slots the kernel never wrote (padding / overflow-clipped).
    # jnp.where, not multiply: unwritten columns may hold NaN garbage.
    keep = slot_mask > 0
    d_mean = jnp.where(keep, d_mean, 0.0)
    d_conic = jnp.where(keep, d_conic, 0.0)
    d_opac = jnp.where(keep, d_opac, 0.0)
    d_color = jnp.where(keep, d_color, 0.0)
    return (None, None, None, d_mean, d_conic, d_opac, d_color, d_bg)


tile_composite.defvjp(_tile_composite_fwd, _tile_composite_bwd)
