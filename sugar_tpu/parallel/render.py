"""Multi-chip tile-sharded differentiable rendering (shard_map).

The BASELINE.json north-star choreography, explicit: Gaussian primitives
are sharded across devices; image tiles are sharded across the same
devices as horizontal bands of tile rows. Per step, on each device:

1. preprocess its Gaussian shard (local, no communication);
2. ``all_gather`` the packed per-Gaussian render data (ROWS x N/S) along
   the shard axis — the "gather visible Gaussians per tile shard"
   collective (XLA rides ICI); its autodiff transpose is the parameter
   gradient ``reduce_scatter`` overlapped with the backward walk;
3. densely expand the local shard into (tile, depth, gid) dup entries
   (same semantics as raster.binning.bin_gaussians_dense) and sort them
   by tile — tile bands are contiguous tile-id ranges, so this groups
   entries by destination device;
4. ``all_to_all`` fixed-capacity per-destination blocks of dup entries to
   their band owners (the static-shape analog of the CUDA dynamic
   duplication buffer, rasterizer_impl.cu:155-194; per-pair overflow is
   returned for the re-jit protocol);
5. merge-sort the received entries by (tile, depth, gid) — float depth
   keys with gaussian-index ties reproduce CUDA's stable [tile|depth]
   radix order exactly (rasterizer_impl.cu:102-104) and make the result
   independent of the device count;
6. gather dup-ordered data from the all-gathered packed array, shift
   mean-y into band-local pixel coordinates, and run the Pallas tile
   compositor on the band (raster.pallas_composite).

The whole function is built from differentiable pieces (collectives,
gather_dup's custom-VJP segmented reduction, tile_composite's custom
VJP), so ``jax.grad`` of a loss over the sharded image yields exactly the
sharded backward: per-band kernel backward -> per-device grad reduction
onto the full Gaussian axis -> psum-scatter back to parameter shards.

The reference has no distributed path at all (SURVEY.md §2.9); this file
is the new first-class component replacing its single-GPU assumption.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sugar_tpu.raster import common as rc
from sugar_tpu.raster.fused import expand_support_culled
from sugar_tpu.raster.pallas_composite import C_CHUNK, R_MY, tile_composite
from sugar_tpu.raster.pallas_render import gather_dup_searchsorted, pack_params
from sugar_tpu.raster.preprocess import preprocess


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def tile_composite_reference(shape_info, tile_start, tile_count, dup_data, bg):
    """Pure-JAX compositor with tile_composite's exact semantics.

    Used on CPU (tests, debugging): interpret-mode Pallas inside an
    8-way shard_map is prohibitively slow. Same include-prefix /
    alpha-clamp / cutoff gating as the kernel; the chunk-level early exit
    only skips all-excluded work so results are identical.
    """
    tiles_x, num_tiles, ch, max_chunks = shape_info
    k = max_chunks * C_CHUNK
    d = dup_data.shape[1]

    def one_tile(i, start, count):
        sl = start + jnp.arange(k, dtype=jnp.int32)
        data = dup_data[:, jnp.minimum(sl, d - 1)]  # (ROWS, K)
        tx, ty = i % tiles_x, i // tiles_x
        lin = jnp.arange(rc.TILE_X * rc.TILE_Y, dtype=jnp.int32)
        px = (tx * rc.TILE_X + lin % rc.TILE_X).astype(jnp.float32)[:, None]
        py = (ty * rc.TILE_Y + lin // rc.TILE_X).astype(jnp.float32)[:, None]
        dx = data[0:1] - px  # (P, K)
        dy = data[1:2] - py
        a_, b_, c_ = data[2:3], data[3:4], data[4:5]
        power = -0.5 * (a_ * dx * dx + c_ * dy * dy) - b_ * dx * dy
        raw = data[5:6] * jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.minimum(rc.ALPHA_CLAMP, raw)
        keep = (
            (power <= 0.0)
            & (alpha >= rc.ALPHA_CUTOFF)
            & (sl >= start)[None, :]
            & (sl < start + count)[None, :]
        )
        alpha = jnp.where(keep, alpha, 0.0)
        u = 1.0 - alpha
        uprod = jnp.cumprod(u, axis=1)
        include = uprod >= rc.T_EPS
        a_eff = alpha * include.astype(jnp.float32)
        t_in = jnp.concatenate([jnp.ones_like(uprod[:, :1]), uprod[:, :-1]], 1)
        w = a_eff * t_in
        color = data[6 : 6 + ch]  # (CH, K)
        img = w @ color.T  # (P, CH)
        t_fin = jnp.min(jnp.where(include, uprod, 1.0), axis=1)
        ninc = jnp.sum((a_eff > 0).astype(jnp.int32), axis=1)
        return img + t_fin[:, None] * bg[None, :], t_fin, ninc

    idx = jnp.arange(num_tiles, dtype=jnp.int32)
    return jax.lax.map(
        lambda args: one_tile(*args), (idx, tile_start, tile_count)
    )


def render_sharded(
    mesh: Mesh,
    axis: str,
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    settings: rc.RasterSettings,
    scales: jnp.ndarray | None = None,
    quaternions: jnp.ndarray | None = None,
    colors: jnp.ndarray | None = None,
    shs: jnp.ndarray | None = None,
    alive_mask: jnp.ndarray | None = None,
    ndc_offset: jnp.ndarray | None = None,
    tile_cap: int = 16,
    route_cap: int | None = None,
    k_max: int = 8192,
    use_kernel: bool | str = "auto",
    cap_a: int = 4,
    big_cap: int | None = None,
) -> dict[str, Any]:
    """Render one view with Gaussians and image-tile bands sharded over
    ``axis`` of ``mesh``. Inputs are (N, ...) global arrays (sharded or
    replicated; shard_map partitions them); the returned image is sharded
    by pixel-row bands. ``route_cap`` is the per-(source, destination)
    dup-entry capacity of the all_to_all routing step.

    ``use_kernel``: "auto" (default) runs the Pallas compositor on TPU
    and the exact-semantics pure-JAX ``tile_composite_reference`` on
    other backends — the TPU interpreter deadlocks when simulating many
    devices inside shard_map, so interpret mode is only sound for small
    meshes (explicitly pass True, as the 2-device kernel tests do).
    """
    if use_kernel == "auto":
        use_kernel = jax.default_backend() == "tpu"
    s = mesh.shape[axis]
    tiles_x, tiles_y = settings.tiles_x, settings.tiles_y
    if tiles_y % s != 0:
        raise ValueError(
            f"tiles_y={tiles_y} must divide by the shard axis size {s} "
            "(pad the image height)"
        )
    n = means3d.shape[0]
    if n % s != 0:
        raise ValueError(f"N={n} must divide by shard axis size {s}")
    ty_local = tiles_y // s
    band_tiles = tiles_x * ty_local
    num_tiles = tiles_x * tiles_y
    ch = 3 if colors is None else colors.shape[-1]
    if route_cap is None:
        route_cap = _round_up(max(tile_cap * n // (s * s) * 2, C_CHUNK), C_CHUNK)
    route_cap = _round_up(route_cap, C_CHUNK)
    max_chunks = max(1, (k_max + C_CHUNK - 1) // C_CHUNK)

    # shard_map can't route None leaves; absent optionals travel as (N,)
    # zero dummies and are restored to None inside the mapped function.
    opt_vals = (scales, quaternions, colors, shs, alive_mask, ndc_offset)
    present = tuple(v is not None for v in opt_vals)
    dummy = jnp.zeros((n,), jnp.float32)
    opt_arrays = tuple(v if v is not None else dummy for v in opt_vals)

    def local_fn(means_l, opac_l, *opt_l):
        scales_l, quats_l, colors_l, shs_l, alive_l, ndc_l = (
            v if p else None for v, p in zip(opt_l, present)
        )
        n_loc = means_l.shape[0]
        sidx = jax.lax.axis_index(axis)
        prep = preprocess(
            means_l,
            opac_l,
            settings,
            scales=scales_l,
            quaternions=quats_l,
            colors=colors_l,
            shs=shs_l,
            alive_mask=alive_l,
            ndc_offset=ndc_l,
        )

        # (2) packed render data, gathered across shards (ROWS, N).
        packed_l = pack_params(prep.mean2d, prep.conic, prep.opacity, prep.color)
        packed = jax.lax.all_gather(packed_l, axis, axis=1, tiled=True)

        # (3) fused bucketed local expansion with exact-support culling
        # (raster.fused): cap_a slots per Gaussian + big_cap wide rows for
        # large rects, and tiles whose pixel box cannot reach alpha >=
        # 1/255 are culled before routing — the r4 single-chip layout,
        # shrinking both the local sorts and the all_to_all traffic at
        # identical output/gradient semantics. Payload = float depth (the
        # cross-device merge key; a per-shard depth rank would not be
        # globally consistent).
        big_cap_l = big_cap
        if big_cap_l is None:
            big_cap_l = n_loc if n_loc < 65536 else max(n_loc // 8, 65536)
        tile_e, depth_e, gid_l, _cc, _nr, big_ovf = expand_support_culled(
            jax.lax.stop_gradient(prep), num_tiles, tiles_x, tile_cap,
            cap_a, big_cap_l, jax.lax.stop_gradient(prep.depth),
        )
        # Local -> global Gaussian ids (sentinel n_loc -> global n).
        gid_e = jnp.where(gid_l < n_loc, sidx * n_loc + gid_l, n)
        # Rect tiles beyond tile_cap / big rows beyond big_cap are dropped;
        # count them so callers can re-jit with larger caps (same protocol
        # as the single-chip fused path).
        tile_cap_overflow = (
            jnp.sum(jnp.maximum(prep.tiles_touched - tile_cap, 0)) + big_ovf
        )

        # Group by destination band (bands are contiguous tile-id ranges).
        tile_s, depth_s, gid_s = jax.lax.sort(
            (tile_e, depth_e, gid_e), dimension=0, num_keys=1, is_stable=False
        )
        d_loc = tile_s.shape[0]
        bstart = jnp.searchsorted(
            tile_s,
            jnp.arange(s + 1, dtype=jnp.int32) * band_tiles,
            side="left",
        ).astype(jnp.int32)

        # (4) fixed-capacity routing blocks: entry (b, i) = i-th dup bound
        # for band b. Overflowing entries are dropped (counted).
        src = bstart[:-1, None] + jnp.arange(route_cap, dtype=jnp.int32)[None, :]
        ok = src < bstart[1:, None]
        src_c = jnp.minimum(src, d_loc - 1)
        inval = jnp.int32(num_tiles)
        tile_r = jnp.where(ok, tile_s[src_c], inval)
        depth_r = jnp.where(ok, depth_s[src_c], jnp.inf)
        gid_r = jnp.where(ok, gid_s[src_c], n)
        route_overflow = jnp.sum(
            jnp.maximum(bstart[1:] - bstart[:-1] - route_cap, 0)
        )

        tile_a = jax.lax.all_to_all(tile_r, axis, split_axis=0, concat_axis=0, tiled=True)
        depth_a = jax.lax.all_to_all(depth_r, axis, split_axis=0, concat_axis=0, tiled=True)
        gid_a = jax.lax.all_to_all(gid_r, axis, split_axis=0, concat_axis=0, tiled=True)

        # (5) merge: exact CUDA [tile | depth-bits | duplication-order] sort.
        tile_m, _, gid_m = jax.lax.sort(
            (tile_a.reshape(-1), depth_a.reshape(-1), gid_a.reshape(-1)),
            dimension=0,
            num_keys=3,
            is_stable=False,
        )
        d_band = tile_m.shape[0]
        bounds = jnp.searchsorted(
            tile_m,
            sidx * band_tiles + jnp.arange(band_tiles + 1, dtype=jnp.int32),
            side="left",
        ).astype(jnp.int32)
        tile_start = bounds[:band_tiles]
        tile_count_raw = bounds[1:] - bounds[:band_tiles]
        tile_count = jnp.minimum(tile_count_raw, max_chunks * C_CHUNK)
        kmax_overflow = jnp.sum(
            jnp.maximum(tile_count_raw - max_chunks * C_CHUNK, 0)
        )

        # (6) dup-ordered data + band-local pixel rows + Pallas composite.
        d_pad = _round_up(d_band, C_CHUNK) + C_CHUNK
        gid_pad = jnp.concatenate(
            [gid_m, jnp.full((d_pad - d_band,), n, jnp.int32)]
        )
        dup = gather_dup_searchsorted(packed, gid_pad, n, 6 + ch, tile_cap)
        rows_pad = ((6 + ch + 7) // 8) * 8
        dup = jnp.pad(dup, ((0, rows_pad - 6 - ch), (0, 0)))
        row_shift = (sidx * ty_local * rc.TILE_Y).astype(jnp.float32)
        row_sel = (jnp.arange(rows_pad) == R_MY).astype(jnp.float32)[:, None]
        dup = dup - row_sel * row_shift

        shape_info = (tiles_x, band_tiles, ch, max_chunks)
        compositor = tile_composite if use_kernel else tile_composite_reference
        img_t, final_t, n_contrib = compositor(
            shape_info, tile_start, tile_count, dup, settings.bg
        )

        def assemble(x, c):
            x = x.reshape(ty_local, tiles_x, rc.TILE_Y, rc.TILE_X, c)
            x = x.transpose(0, 2, 1, 3, 4).reshape(
                ty_local * rc.TILE_Y, tiles_x * rc.TILE_X, c
            )
            return x[:, : settings.image_width]

        return (
            assemble(img_t, ch),
            assemble(final_t[..., None], 1)[..., 0],
            assemble(n_contrib[..., None], 1)[..., 0],
            prep.radius,
            jax.lax.psum(route_overflow, axis),
            jax.lax.psum(tile_cap_overflow, axis),
            jax.lax.psum(kmax_overflow, axis),
        )

    in_specs = (P(axis),) * (2 + len(opt_arrays))
    out_specs = (P(axis), P(axis), P(axis), P(axis), P(), P(), P())

    image, final_t, n_contrib, radii, overflow, cap_ovf, kmax_ovf = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(means3d, opacities, *opt_arrays)
    return dict(
        image=image[: settings.image_height],
        final_T=final_t[: settings.image_height],
        n_contrib=n_contrib[: settings.image_height],
        radii=radii,
        route_overflow=overflow,
        tile_overflow=cap_ovf,
        kmax_overflow=kmax_ovf,
    )
