"""Pallas TPU kernel: segmented column-sum of gid-sorted data via MXU.

The gradient reduction (dup-slot cotangents -> per-Gaussian gradients)
previously ran as a log2(seg_cap)-step shift-and-add scan over the sorted
(rows, D) array followed by a start-position gather — and the gather alone
costs ~28 ms at bench scale (gathers are ~9-28 ns per lookup on v5e,
scaling with table size; see PERF.md). This kernel does the whole
reduction at MXU speed instead:

The input columns are sorted by gaussian id, so each grid chunk of CS
consecutive slots touches a CONTIGUOUS gaussian-id window. Per chunk, a
(W, CS) one-hot of (gid - window_base) is contracted with the (R, CS) data
chunk on the MXU, producing the chunk's (R, W) per-gaussian partial sums,
which are read-modify-write accumulated into the (R, N) output at the
window offset. Chunks at segment boundaries share a gaussian, so every
window write is an RMW against a zero-initialized, input_output_aliased
output; the TPU grid is sequential and each step drains its write before
finishing, so cross-step RMW is race-free (same discipline as
pallas_composite's grad RMW).

Sparse id regions (a chunk whose ids span more than one window) are
handled by an inner loop over sub-windows; the per-chunk sub-window count
is scalar-prefetched. Window bases are aligned down to the 128-lane grid,
so the effective stride is W - 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CS = 1024  # dup slots per grid chunk
W = 2048  # gaussian-id window width (VMEM one-hot is (W, CS) f32)
STRIDE = W - 128  # id coverage per sub-window after base alignment


def _interpret_param():
    if jax.default_backend() != "tpu":
        return pltpu.InterpretParams()
    return False


def _kernel(glo_ref, nsub_ref, gid_ref, ct_ref, zeros_ref, out_hbm,
            acc_s, win_s, sem_r, sem_w, *, rows: int, n_pad: int):
    del zeros_ref  # aliased to out_hbm: zero-initializes the RMW target
    c = pl.program_id(0)
    g0 = glo_ref[c]

    gid_chunk = gid_ref[0][None, :]  # (1, CS) int32
    ct_chunk = ct_ref[...]  # (rows, CS)

    def sub(s, _):
        # Sub-window s OWNS ids [g0 + s*STRIDE, g0 + (s+1)*STRIDE): the
        # half-open ownership prevents double counting where consecutive
        # (128-aligned) windows overlap; the aligned window always covers
        # the owned range since STRIDE = W - 128.
        own_lo = g0 + s * STRIDE
        base = pl.multiple_of(own_lo // 128 * 128, 128)
        j = gid_chunk - base  # (1, CS)
        own = (gid_chunk >= own_lo) & (gid_chunk < own_lo + STRIDE)
        oh = (
            (jax.lax.broadcasted_iota(jnp.int32, (W, CS), 0) == j) & own
        ).astype(jnp.float32)
        acc_s[...] = jax.lax.dot_general(
            ct_chunk, oh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, W)
        # RMW the output window (sequential grid => race-free).
        read = pltpu.make_async_copy(
            out_hbm.at[:, pl.ds(base, W)], win_s, sem_r
        )
        read.start()
        read.wait()
        win_s[...] += acc_s[...]
        write = pltpu.make_async_copy(
            win_s, out_hbm.at[:, pl.ds(base, W)], sem_w
        )
        write.start()
        write.wait()
        return 0

    jax.lax.fori_loop(0, nsub_ref[c], sub, 0)


def _segment_sum_reference(ct, gid, n):
    """Pure-XLA fallback (non-TPU backends): log-step shift-and-add scan
    within segments + a searchsorted start-position gather. Semantically
    identical to the kernel; the TPU kernel exists because this path's
    extraction gather costs ~28 ms at bench scale on v5e. The scan depth
    is log2(D) (data-independent), which always covers the longest
    possible segment."""
    rows, d = ct.shape
    y = ct
    sh = 1
    while sh < d:
        y_next = jnp.pad(y[:, sh:], ((0, 0), (0, sh)))
        g_next = jnp.pad(gid[sh:], (0, sh), constant_values=-1)
        y = y + jnp.where((g_next == gid)[None, :], y_next, 0.0)
        sh *= 2
    starts = jnp.searchsorted(
        gid, jnp.arange(n + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    nonempty = starts[:-1] < starts[1:]
    return jnp.where(
        nonempty[None, :], y[:, jnp.minimum(starts[:-1], d - 1)], 0.0
    )


@functools.partial(jax.jit, static_argnames=("n", "force_kernel"))
def segment_sum_sorted(
    ct: jnp.ndarray,  # (rows, D) f32, columns sorted by gid
    gid: jnp.ndarray,  # (D,) int32 ascending; sentinel >= n for dead slots
    n: int,
    force_kernel: bool = False,
) -> jnp.ndarray:
    """Returns (rows, n): out[:, g] = sum of ct columns with gid == g.

    Sentinel ids (n <= gid) accumulate into padding columns and are
    discarded by the final slice. On non-TPU backends a pure-XLA
    reference runs instead of the interpreted kernel (the interpreter is
    far too slow inside large test graphs); ``force_kernel`` opts back in
    for kernel unit tests."""
    if not force_kernel and jax.default_backend() != "tpu":
        return _segment_sum_reference(ct, gid, n)
    rows_in, d = ct.shape
    # Pad rows to the Mosaic 8-sublane multiple and the slot axis to a CS
    # multiple (sentinel ids, zero data).
    rows = ((rows_in + 7) // 8) * 8
    d_pad = ((d + CS - 1) // CS) * CS
    if d_pad != d or rows != rows_in:
        ct = jnp.pad(ct, ((0, rows - rows_in), (0, d_pad - d)))
        gid = jnp.pad(gid, (0, d_pad - d), constant_values=n)
    n_chunks = d_pad // CS
    # Sentinel ids can be as large as n (gather_dup's convention); padding
    # columns must cover base..base+W beyond them.
    n_out = ((n + 1 + 127) // 128) * 128 + W

    glo = gid[::CS].astype(jnp.int32)  # (n_chunks,)
    ghi = gid[CS - 1 :: CS].astype(jnp.int32)
    span = ghi - (glo // 128 * 128)
    nsub = jnp.maximum((span + STRIDE) // STRIDE, 1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            # gid rides as (1, D) so the (1, CS) block's sublane dim equals
            # the full array dim (Mosaic's block-shape divisibility rule).
            pl.BlockSpec((1, CS), lambda c, *_: (0, c)),
            pl.BlockSpec((rows, CS), lambda c, *_: (0, c)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((rows, W), jnp.float32),
            pltpu.VMEM((rows, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_kernel, rows=rows, n_pad=n_out),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, n_out), jnp.float32)],
        # zeros operand (index 4: 2 scalar-prefetch + gid + ct) aliased to
        # the output, zero-initializing the RMW target.
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret_param(),
    )
    gid_b = gid.reshape(1, d_pad)
    zeros = jnp.zeros((rows, n_out), jnp.float32)
    (out,) = kernel(glo, nsub, gid_b, ct, zeros)
    return out[:rows_in, :n]
