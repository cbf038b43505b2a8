"""Pallas TPU kernel for per-tile alpha compositing (forward + custom VJP).

Production path: binning emits ONE packed dup array (ROWS, D) in
[tile | depth]-sorted order — rows 0:2 mean2d, 2:5 conic, 5 opacity,
6:6+CH color, zero-padded to ROWS=16 so sublane tiling divides the DMA
shape; the dup axis rides the 128-lane dimension. Tile ranges are NOT
chunk-aligned: each grid program DMAs the chunk-floor-aligned superset of
its [start, start+count) range and masks non-owned lead/tail slots, which
removes the aligned re-layout gather a previous revision needed (a full
extra pass over the dup array).

Compositing is in LINEAR space, exactly like the CUDA kernel
(forward.cu:261-374): per chunk, u = 1 - alpha, one Hillis-Steele
cumulative *product* U over the 256 lanes (Mosaic has no scan primitive;
log-space double-cumsum formulations cost 2 scans + 4 transcendentals —
this costs 1 scan + the single unavoidable exp for alpha). The CUDA
per-pixel ``done`` flag (T*(1-a) < 1e-4 -> stop forever, forward.cu:
251-261) is reproduced by include = p_carry * U >= T_EPS: exclusion is
permanent, so the include set is a prefix and ONE ungated running product
p_carry both drives the mask and the chunk-level early-exit.

Backward (same grid): the forward records only each chunk's entry p_carry
(T_in = p_entry * exclusive-U is exact up to the first exclusion, after
which weights are zero anyway) plus the processed-chunk count; the
backward re-walks those chunks in reverse, computing

  dL/dalpha_i = (c_i . g) T_i  -  (S_i + T_fin * gt) / (1 - alpha_i)

with S_i the running suffix of w_j (c_j . g) — the vectorized equivalent
of the CUDA back-to-front walk (backward.cu:441-554). Per-dup-slot
gradients go to a packed (ROWS, D) gradient array. Chunks at tile range
boundaries are SHARED between adjacent tiles, so every chunk write is a
read-modify-write against a zero-initialized, input_output_aliased output
(the TPU grid is sequential on the single tensor core, and write DMAs are
drained before a grid step ends, so cross-step RMW is race-free). This is
the atomics-free grad scatter of SURVEY.md §7 hard part #2; the
sort-based segmented reduction in pallas_render folds slots onto
Gaussians.

Gradient conventions match CUDA: straight-through 0.99 alpha clamp, hard
1/255 cutoff, no gradient through the T_EPS stop.
"""

from __future__ import annotations


import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sugar_tpu.raster import common as rc


def _interpret_param():
    """TPU-semantics interpreter on non-TPU backends (tests, the driver's
    virtual-CPU multichip dryrun); False (Mosaic lowering) on real
    hardware. Mirrors the CUDA rasterizer's debug cross-check spirit
    (diff_gaussian_rasterization/__init__.py:83-90): the same kernel code
    runs everywhere, just interpreted where Mosaic can't lower. Passed as
    the pallas_call interpret= param (not a context manager) because
    custom_vjp fwd/bwd traces are deferred outside any caller's dynamic
    context."""
    if jax.default_backend() != "tpu":
        return pltpu.InterpretParams()
    return False

C_CHUNK = 256  # gaussians per DMA'd chunk (2 x 128 lanes)
# Live packed component rows = 6 + CH (mean2d 2, conic 3, opacity 1,
# color CH). Mosaic requires sublane-dim DMA slices aligned to the (8,128)
# tiling, so HBM/VMEM buffers round rows up to a multiple of 8 — but the
# expensive host-side gather runs on the live rows only and zero-pads
# afterwards (pallas_render). ROWS is the CH=3 padded default.
ROWS = 16
P_TILE = rc.TILE_X * rc.TILE_Y

# Packed row indices.
R_MX, R_MY = 0, 1
R_CA, R_CB, R_CC = 2, 3, 4
R_OP = 5
R_COL = 6  # 6 .. 6+CH


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _cumprod1(x):
    """Inclusive cumulative product along axis 1 of (P, C_CHUNK).

    Hillis-Steele with lane rolls: log2(C) multiply steps on the VPU
    (identity element 1.0 outside the window)."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = x
    sh = 1
    while sh < C_CHUNK:
        rolled = pltpu.roll(y, sh, 1)
        y = y * jnp.where(col >= sh, rolled, 1.0)
        sh *= 2
    return y


def _cumsum1(x):
    """Inclusive cumulative sum along axis 1 of (P, C_CHUNK)."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = x
    sh = 1
    while sh < C_CHUNK:
        rolled = pltpu.roll(y, sh, 1)
        y = y + jnp.where(col >= sh, rolled, 0.0)
        sh *= 2
    return y


def _suffix1(x):
    """Strict suffix sum along axis 1: out[:, i] = sum_{j>i} x[:, j]."""
    return jnp.sum(x, axis=1, keepdims=True) - _cumsum1(x)


def _shift_fill1(x):
    """Exclusive shift along axis 1: out[:, 0] = 1, out[:, i] = x[:, i-1]."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= 1, pltpu.roll(x, 1, 1), 1.0)


def _pixel_coords(i, tiles_x):
    """(P, 1) float pixel x / y coords for tile index i."""
    tx = i % tiles_x
    ty = i // tiles_x
    lin = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, 1), 0)
    px = (tx * rc.TILE_X + lin % rc.TILE_X).astype(jnp.float32)
    py = (ty * rc.TILE_Y + lin // rc.TILE_X).astype(jnp.float32)
    return px, py


def _chunk_alpha(data_s, px, py, slot0, start, end):
    """(alpha gated, exp(min(power,0)), dx, dy) for one packed chunk.

    ``slot0`` is the chunk's first global dup-slot index; slots outside
    [start, end) belong to a neighboring tile (or padding) and are gated
    off — the CUDA equivalents of the gates are forward.cu:251-254. The
    exp input is clamped: CUDA skips power > 0 before evaluating exp
    (forward.cu:246-247), so the clamp only bounds values on already-gated
    slots (keeping 0 * exp products NaN-free in the backward)."""
    dx = data_s[R_MX : R_MX + 1, :] - px  # (P, C)
    dy = data_s[R_MY : R_MY + 1, :] - py
    a = data_s[R_CA : R_CA + 1, :]
    b = data_s[R_CB : R_CB + 1, :]
    cc = data_s[R_CC : R_CC + 1, :]
    power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
    # where(), not min(): a non-finite power on a gated slot (NaN conic
    # from a poisoned-but-culled Gaussian) would make e NaN, and the
    # backward's 0 * e products would scatter NaN into otherwise-finite
    # gradients. Valid slots always have power <= 0 here, so values and
    # gradients are unchanged for every contributing slot.
    e = jnp.exp(jnp.where(power <= 0.0, power, 0.0))
    raw = data_s[R_OP : R_OP + 1, :] * e
    alpha = jnp.minimum(rc.ALPHA_CLAMP, raw)
    slot = slot0 + jax.lax.broadcasted_iota(jnp.int32, (1, C_CHUNK), 1)
    keep = (
        (power <= 0.0)
        & (alpha >= rc.ALPHA_CUTOFF)
        & (slot >= start)
        & (slot < end)
    )
    return jnp.where(keep, alpha, 0.0), e, dx, dy


def _dma_in(chunk, src_ref, dst_slot, sem_slot):
    offs = pl.multiple_of(chunk * C_CHUNK, C_CHUNK)
    return pltpu.make_async_copy(
        src_ref.at[:, pl.ds(offs, C_CHUNK)], dst_slot, sem_slot
    )


def _dma_out(chunk, src_slot, dst_ref, sem_slot):
    offs = pl.multiple_of(chunk * C_CHUNK, C_CHUNK)
    return pltpu.make_async_copy(
        src_slot, dst_ref.at[:, pl.ds(offs, C_CHUNK)], sem_slot
    )


def _fwd_kernel(
    start_ref, count_ref,
    data_ref,
    img_ref, t_ref, n_ref, entry_p_ref, nch_ref,
    data_s, sem,
    *, tiles_x: int, ch: int, max_chunks: int,
):
    i = pl.program_id(0)
    start = start_ref[i]
    count = count_ref[i]
    end = start + count
    c0 = start // C_CHUNK
    # Covering `count` entries from an unaligned start can take one more
    # chunk than the count-derived bound (hence max_chunks + 1 capacity).
    n_tile_chunks = jnp.where(count > 0, pl.cdiv(end, C_CHUNK) - c0, 0)
    px, py = _pixel_coords(i, tiles_x)

    def cond(carry):
        c_idx, p_carry, t_carry, acc, ninc = carry
        return (c_idx < n_tile_chunks) & (jnp.max(p_carry) >= rc.T_EPS)

    def body(carry):
        c_idx, p_carry, t_carry, acc, ninc = carry
        slot = jax.lax.rem(c_idx, 2)
        # Record the chunk's entry state for the backward pass.
        entry_p_ref[0, pl.ds(c_idx, 1), :] = p_carry.reshape(1, P_TILE)
        # Wait for this chunk's prefetched DMA, immediately prefetch next.
        _dma_in(c0 + c_idx, data_ref, data_s.at[slot], sem.at[slot]).wait()

        @pl.when(c_idx + 1 < n_tile_chunks)
        def _():
            _dma_in(
                c0 + c_idx + 1, data_ref, data_s.at[1 - slot], sem.at[1 - slot]
            ).start()

        slot0 = (c0 + c_idx) * C_CHUNK
        alpha, _, _, _ = _chunk_alpha(data_s[slot], px, py, slot0, start, end)
        u = 1.0 - alpha
        uprod = _cumprod1(u)  # (P, C) inclusive
        include = (p_carry * uprod) >= rc.T_EPS  # prefix mask (see docstring)
        a_eff = alpha * include.astype(jnp.float32)
        t_in = p_carry * _shift_fill1(uprod)  # transmittance before slot i
        w = a_eff * t_in
        color = data_s[slot, R_COL : R_COL + ch, :]  # (CH, C)
        contrib = jax.lax.dot_general(
            w, color, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, CH)
        # Gated chunk product = U at the last included slot = min over the
        # included prefix (u <= 1 so U is nonincreasing).
        t_chunk = jnp.min(jnp.where(include, uprod, 1.0), axis=1, keepdims=True)
        return (
            c_idx + 1,
            p_carry * uprod[:, C_CHUNK - 1 :],
            t_carry * t_chunk,
            acc + contrib,
            ninc + jnp.sum((a_eff > 0).astype(jnp.int32), axis=1, keepdims=True),
        )

    # Prefetch the first chunk, then loop with double buffering.
    @pl.when(n_tile_chunks > 0)
    def _():
        _dma_in(c0, data_ref, data_s.at[0], sem.at[0]).start()

    init = (
        jnp.zeros((), jnp.int32),
        jnp.ones((P_TILE, 1), jnp.float32),
        jnp.ones((P_TILE, 1), jnp.float32),
        jnp.zeros((P_TILE, ch), jnp.float32),
        jnp.zeros((P_TILE, 1), jnp.int32),
    )
    c_exit, _, t_carry, acc, ninc = jax.lax.while_loop(cond, body, init)

    # Drain a prefetched-but-unconsumed DMA when the transmittance early-exit
    # fired with more chunks remaining (semaphores must be balanced).
    @pl.when(c_exit < n_tile_chunks)
    def _():
        slot = jax.lax.rem(c_exit, 2)
        _dma_in(c0 + c_exit, data_ref, data_s.at[slot], sem.at[slot]).wait()

    img_ref[0] = acc
    t_ref[0] = t_carry
    n_ref[0] = ninc
    # Lane-replicated scalar: (1,1,128) int32 blocks satisfy Mosaic tiling
    # (SMEM outputs / sub-lane blocks do not lower on hardware).
    nch_ref[0] = jnp.full((1, 128), c_exit, jnp.int32)


def _bwd_kernel(
    start_ref, count_ref, nch_ref,
    data_ref, zeros_ref,
    g_ref, gt_ref, tfin_ref, entry_p_ref,
    dgrad_hbm,
    data_s, dgrad_s,
    sem, rsem, wsem,
    *, tiles_x: int, ch: int, max_chunks: int,
):
    """Reverse walk over the chunks the forward processed.

    DMA discipline (every start is waited exactly once):
      - data read for step k: started at step k-1 (prologue for k=0) into
        data_s[k % 2]; waited at step k.
      - grad RMW read for step k: started at step k-1 (prologue for k=0)
        into dgrad_s[k % 2]; waited at step k before accumulation.
      - grad write of step k: started at end of step k from dgrad_s[k % 2];
        waited at step k+1 just before reusing that buffer for the k+1
        grad-read prefetch, or in the epilogue drain for the last two steps.
    """
    del zeros_ref  # aliased to dgrad_hbm; zero-initializes the RMW target
    i = pl.program_id(0)
    start = start_ref[i]
    count = count_ref[i]
    end = start + count
    c0 = start // C_CHUNK
    px, py = _pixel_coords(i, tiles_x)
    g = g_ref[0]  # (P, CH)
    gt = gt_ref[0]  # (P, 1)
    t_fin = tfin_ref[0]  # (P, 1)
    # Chunks the forward actually processed (early exit included): chunks
    # beyond it contributed nothing; their grad slots stay zero-initialized.
    n_chunks = nch_ref[i]

    def rev_chunk(k):
        # k-th reverse step processes chunk index (within the dup array)
        # c0 + n_chunks - 1 - k.
        return c0 + n_chunks - 1 - k

    @pl.when(n_chunks > 0)
    def _():
        _dma_in(rev_chunk(0), data_ref, data_s.at[0], sem.at[0]).start()
        _dma_in(rev_chunk(0), dgrad_hbm, dgrad_s.at[0], rsem.at[0]).start()

    def b_body(k, sdotg_in):
        c_idx = n_chunks - 1 - k
        slot = jax.lax.rem(k, 2)
        nslot = 1 - slot
        _dma_in(c0 + c_idx, data_ref, data_s.at[slot], sem.at[slot]).wait()

        @pl.when(k + 1 < n_chunks)
        def _():
            _dma_in(c0 + c_idx - 1, data_ref, data_s.at[nslot], sem.at[nslot]).start()

        base_p = entry_p_ref[0, pl.ds(c_idx, 1), :].reshape(P_TILE, 1)
        slot0 = (c0 + c_idx) * C_CHUNK
        alpha, e_pow, dx, dy = _chunk_alpha(data_s[slot], px, py, slot0, start, end)
        u = 1.0 - alpha
        uprod = _cumprod1(u)
        include = (base_p * uprod) >= rc.T_EPS
        a_eff = alpha * include.astype(jnp.float32)
        t_in = base_p * _shift_fill1(uprod)
        w = a_eff * t_in
        color = data_s[slot, R_COL : R_COL + ch, :]  # (CH, C)
        cdotg = jax.lax.dot_general(
            g, color, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, C)
        wc = w * cdotg
        suffix = _suffix1(wc) + sdotg_in
        one_m_a = jnp.maximum(1.0 - a_eff, 1.0 - rc.ALPHA_CLAMP)
        act_b = a_eff > 0.0
        active = act_b.astype(jnp.float32)
        dalpha = (t_in * cdotg - suffix / one_m_a) * active  # (P, C)

        def gated(x):
            # Inactive slots contribute exactly 0 — via where(), so a
            # non-finite conic/mean on a gated slot cannot turn the
            # 0-contribution into NaN (0 * inf) in the accumulations below.
            return jnp.where(act_b, x, 0.0)

        # Grad RMW read for this chunk (started at k-1 / prologue).
        _dma_in(c0 + c_idx, dgrad_hbm, dgrad_s.at[slot], rsem.at[slot]).wait()

        # Prefetch the next chunk's grad read into the other buffer; its
        # pending write (from step k-1) must retire first.
        @pl.when(k + 1 < n_chunks)
        def _():
            @pl.when(k >= 1)
            def _():
                _dma_out(
                    rev_chunk(k - 1), dgrad_s.at[nslot], dgrad_hbm, wsem.at[nslot]
                ).wait()

            _dma_in(c0 + c_idx - 1, dgrad_hbm, dgrad_s.at[nslot], rsem.at[nslot]).start()

        # Accumulate this tile's contribution into the chunk's grads.
        dgrad_s[slot, R_COL : R_COL + ch, :] += jax.lax.dot_general(
            g, w, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dgrad_s[slot, R_OP : R_OP + 1, :] += jnp.sum(
            gated(dalpha * e_pow), axis=0, keepdims=True
        )
        dpower = dalpha * data_s[slot, R_OP : R_OP + 1, :] * e_pow  # = dalpha*raw
        a_c = data_s[slot, R_CA : R_CA + 1, :]
        b_c = data_s[slot, R_CB : R_CB + 1, :]
        c_c = data_s[slot, R_CC : R_CC + 1, :]
        # power = -0.5(a dx^2 + c dy^2) - b dx dy, d = mean - pix.
        dgrad_s[slot, R_MX : R_MX + 1, :] += jnp.sum(
            gated(dpower * -(a_c * dx + b_c * dy)), axis=0, keepdims=True
        )
        dgrad_s[slot, R_MY : R_MY + 1, :] += jnp.sum(
            gated(dpower * -(c_c * dy + b_c * dx)), axis=0, keepdims=True
        )
        dgrad_s[slot, R_CA : R_CA + 1, :] += jnp.sum(
            gated(dpower * (-0.5 * dx * dx)), axis=0, keepdims=True
        )
        dgrad_s[slot, R_CB : R_CB + 1, :] += jnp.sum(
            gated(dpower * -(dx * dy)), axis=0, keepdims=True
        )
        dgrad_s[slot, R_CC : R_CC + 1, :] += jnp.sum(
            gated(dpower * (-0.5 * dy * dy)), axis=0, keepdims=True
        )

        _dma_out(c0 + c_idx, dgrad_s.at[slot], dgrad_hbm, wsem.at[slot]).start()
        return sdotg_in + jnp.sum(wc, axis=1, keepdims=True)

    jax.lax.fori_loop(0, n_chunks, b_body, t_fin * gt)

    # Drain the last two outstanding grad writes (earlier ones were waited
    # inside the loop before their buffer was reused).
    def drain(k):
        @pl.when((k >= 0) & (k < n_chunks))
        def _():
            slot = jax.lax.rem(k, 2)
            _dma_out(rev_chunk(k), dgrad_s.at[slot], dgrad_hbm, wsem.at[slot]).wait()

    drain(n_chunks - 1)
    drain(n_chunks - 2)


def _make_fwd(tiles_x, num_tiles, ch, max_chunks):
    rec = _round8(max_chunks + 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, P_TILE, ch), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, P_TILE, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, P_TILE, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rec, P_TILE), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, _round8(6 + ch), C_CHUNK), jnp.float32),
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
            jax.ShapeDtypeStruct((num_tiles, rec, P_TILE), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, 128), jnp.int32),
        ],
        interpret=_interpret_param(),
    )


def _make_bwd(tiles_x, num_tiles, ch, max_chunks, capacity_pad):
    rec = _round8(max_chunks + 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, P_TILE, ch), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, P_TILE, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, P_TILE, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rec, P_TILE), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, _round8(6 + ch), C_CHUNK), jnp.float32),
            pltpu.VMEM((2, _round8(6 + ch), C_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x, ch=ch, max_chunks=max_chunks),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((_round8(6 + ch), capacity_pad), jnp.float32)],
        # The zeros operand (index 4: after 3 scalar-prefetch args + data)
        # is aliased to the grad output, zero-initializing the RMW target.
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret_param(),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def tile_composite(
    shape_info: tuple,  # (tiles_x, num_tiles, ch, max_chunks)
    tile_start: jnp.ndarray,  # (T,) int32 offsets into dup_data (unaligned)
    tile_count: jnp.ndarray,  # (T,) int32 (<= max_chunks * C_CHUNK)
    dup_data: jnp.ndarray,  # (ROWS, D_pad) packed component-major dup order
    bg: jnp.ndarray,  # (CH,)
):
    """Returns (tile images (T, P, CH), final_T (T, P), n_contrib (T, P))."""
    out, _ = _tile_composite_fwd(shape_info, tile_start, tile_count, dup_data, bg)
    return out


def _tile_composite_fwd(shape_info, tile_start, tile_count, dup_data, bg):
    tiles_x, num_tiles, ch, max_chunks = shape_info
    fwd = _make_fwd(tiles_x, num_tiles, ch, max_chunks)
    img, t_fin, ninc, entry_p, nch = fwd(tile_start, tile_count, dup_data)
    t_fin2 = t_fin[..., 0]  # (T, P)
    image = img + t_fin2[:, :, None] * bg[None, None, :]
    res = (tile_start, tile_count, dup_data, bg, t_fin, entry_p, nch[:, 0, 0])
    return (image, t_fin2, ninc[..., 0]), res


def _tile_composite_bwd(shape_info, res, cot):
    tiles_x, num_tiles, ch, max_chunks = shape_info
    (tile_start, tile_count, dup_data, bg, t_fin, entry_p, nch) = res
    g_img, g_t, _g_n = cot
    gt_total = g_t + jnp.einsum("tpc,c->tp", g_img, bg)
    d_bg = jnp.einsum("tp,tpc->c", t_fin[..., 0], g_img)
    bwd = _make_bwd(tiles_x, num_tiles, ch, max_chunks, dup_data.shape[1])
    zeros = jnp.zeros((dup_data.shape[0], dup_data.shape[1]), jnp.float32)
    (d_packed,) = bwd(
        tile_start, tile_count, nch, dup_data, zeros,
        g_img, gt_total[..., None], t_fin, entry_p,
    )
    return (None, None, d_packed, d_bg)


tile_composite.defvjp(_tile_composite_fwd, _tile_composite_bwd)
