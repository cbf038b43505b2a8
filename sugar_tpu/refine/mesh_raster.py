"""Minimal differentiated-free triangle rasterizer (z-buffer, face ids).

Replaces PyTorch3D's MeshRasterizer for the two places the pipeline needs
triangle rasterization (SURVEY.md §2.7 external deps): UV texture baking
(per-pixel face id + barycentrics, sugar_model.py:2648-2675) and the
optional splatted-proxy depth path. TPU-native design: same static-capacity
tile binning as the Gaussian path, but the per-tile reduction is a z-buffer
min instead of an alpha scan.

Outputs per pixel: nearest face index (-1 = none), perspective-correct
barycentrics, and view-space depth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sugar_tpu.core.cameras import Camera
from sugar_tpu.raster import common as rc


@functools.partial(jax.jit, static_argnames=("camera_static", "dup_capacity", "k_max", "tile_chunk"))
def _rasterize_impl(vertices, faces, world_view, full_proj, camera_static, dup_capacity, k_max, tile_chunk):
    h, w, tan_x, tan_y = camera_static
    tiles_x = (w + rc.TILE_X - 1) // rc.TILE_X
    tiles_y = (h + rc.TILE_Y - 1) // rc.TILE_Y
    num_tiles = tiles_x * tiles_y
    f = faces.shape[0]

    # Project vertices.
    v_h = vertices @ full_proj[:, :3].T + full_proj[:, 3]
    v_z = vertices @ world_view[2, :3] + world_view[2, 3]
    w_safe = jnp.where(jnp.abs(v_h[:, 3]) > 1e-7, v_h[:, 3], 1e-7)
    ndc = v_h[:, :2] / w_safe[:, None]
    pix = jnp.stack(
        [
            ((ndc[:, 0] + 1) * w - 1) * 0.5,
            ((ndc[:, 1] + 1) * h - 1) * 0.5,
        ],
        axis=-1,
    )  # (V, 2)

    fv_pix = pix[faces]  # (F, 3, 2)
    fv_z = v_z[faces]  # (F, 3)
    valid = jnp.all(fv_z > 0.01, axis=-1)  # near-cull whole triangle

    # Tile rects from pixel bboxes.
    lo = jnp.min(fv_pix, axis=1)
    hi = jnp.max(fv_pix, axis=1)
    rmin_x = jnp.clip(jnp.floor(lo[:, 0] / rc.TILE_X).astype(jnp.int32), 0, tiles_x)
    rmin_y = jnp.clip(jnp.floor(lo[:, 1] / rc.TILE_Y).astype(jnp.int32), 0, tiles_y)
    rmax_x = jnp.clip(
        (jnp.floor(hi[:, 0] / rc.TILE_X) + 1).astype(jnp.int32), 0, tiles_x
    )
    rmax_y = jnp.clip(
        (jnp.floor(hi[:, 1] / rc.TILE_Y) + 1).astype(jnp.int32), 0, tiles_y
    )
    counts = jnp.where(valid, (rmax_x - rmin_x) * (rmax_y - rmin_y), 0)

    # Static-capacity duplication (binning.py pattern).
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    d = jnp.arange(dup_capacity, dtype=jnp.int32)
    from sugar_tpu.raster.binning import bucketize_by_offsets

    g = jnp.clip(bucketize_by_offsets(offsets, dup_capacity), 0, f - 1)
    local = d - offsets[g]
    in_range = (d < total) & (local < counts[g])
    rw = jnp.maximum(rmax_x[g] - rmin_x[g], 1)
    tx = rmin_x[g] + local % rw
    ty = rmin_y[g] + local // rw
    tile_id = jnp.where(in_range, ty * tiles_x + tx, num_tiles)
    sorted_tile, sorted_face = jax.lax.sort((tile_id, g), dimension=0, num_keys=1, is_stable=True)
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(
        sorted_tile, t_ids, side="left", method="sort"
    ).astype(jnp.int32)
    tile_count = (
        jnp.searchsorted(sorted_tile, t_ids, side="right", method="sort").astype(jnp.int32)
        - tile_start
    )

    # Per-tile z-buffer.
    py_g, px_g = jnp.meshgrid(
        jnp.arange(rc.TILE_Y, dtype=jnp.float32),
        jnp.arange(rc.TILE_X, dtype=jnp.float32),
        indexing="ij",
    )
    tile_x_idx = t_ids % tiles_x
    tile_y_idx = t_ids // tiles_x
    pix_all = jnp.stack(
        [
            tile_x_idx[:, None] * rc.TILE_X + px_g.reshape(-1)[None, :],
            tile_y_idx[:, None] * rc.TILE_Y + py_g.reshape(-1)[None, :],
        ],
        axis=-1,
    )  # (T, P, 2)

    p_tile = rc.TILE_X * rc.TILE_Y

    def tile_fn(start, count, pixc):
        slots = start + jnp.arange(k_max, dtype=jnp.int32)
        in_list = jnp.arange(k_max, dtype=jnp.int32) < count
        fid = sorted_face[jnp.clip(slots, 0, dup_capacity - 1)]
        tri = fv_pix[fid]  # (K, 3, 2)
        tz = fv_z[fid]  # (K, 3)
        # Edge functions (signed areas) for barycentrics.
        x0, y0 = tri[:, 0, 0:1], tri[:, 0, 1:2]
        x1, y1 = tri[:, 1, 0:1], tri[:, 1, 1:2]
        x2, y2 = tri[:, 2, 0:1], tri[:, 2, 1:2]
        px_ = pixc[None, :, 0]
        py_ = pixc[None, :, 1]
        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)  # (K, 1)
        area_safe = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        w0 = ((x1 - px_) * (y2 - py_) - (x2 - px_) * (y1 - py_)) / area_safe
        w1 = ((x2 - px_) * (y0 - py_) - (x0 - px_) * (y2 - py_)) / area_safe
        w2 = 1.0 - w0 - w1
        # Small negative tolerance keeps shared triangle edges watertight
        # (strictly-zero tests drop crack pixels on the diagonal).
        eps = 1e-5
        inside = (
            (w0 >= -eps) & (w1 >= -eps) & (w2 >= -eps)
            & in_list[:, None]
            & (jnp.abs(area) > 1e-12)
        )
        # Perspective-correct interpolation of z and barycentrics.
        inv_z = w0 / tz[:, 0:1] + w1 / tz[:, 1:2] + w2 / tz[:, 2:3]
        z = 1.0 / jnp.maximum(inv_z, 1e-12)
        z = jnp.where(inside, z, jnp.inf)
        best = jnp.argmin(z, axis=0)  # (P,)
        zbuf = jnp.min(z, axis=0)
        hit = jnp.isfinite(zbuf)
        sel = lambda a: jnp.take_along_axis(a, best[None, :], axis=0)[0]
        bw0 = sel(w0 / tz[:, 0:1] * z)
        bw1 = sel(w1 / tz[:, 1:2] * z)
        bw2 = sel(w2 / tz[:, 2:3] * z)
        face_out = jnp.where(hit, fid[best], -1)
        bary = jnp.stack([bw0, bw1, bw2], axis=-1)
        bary = jnp.where(hit[:, None], bary, 0.0)
        return face_out, jnp.where(hit, zbuf, -1.0), bary

    pad_tiles = (-num_tiles) % tile_chunk
    n_chunks = (num_tiles + pad_tiles) // tile_chunk
    start_p = jnp.pad(tile_start, (0, pad_tiles))
    count_p = jnp.pad(tile_count, (0, pad_tiles))
    pix_p = jnp.pad(pix_all, ((0, pad_tiles), (0, 0), (0, 0)))

    face_t, z_t, bary_t = jax.lax.map(
        lambda args: jax.vmap(tile_fn)(*args),
        (
            start_p.reshape(n_chunks, tile_chunk),
            count_p.reshape(n_chunks, tile_chunk),
            pix_p.reshape(n_chunks, tile_chunk, p_tile, 2),
        ),
    )

    def assemble(x, c, dtype):
        x = x.reshape(num_tiles + pad_tiles, p_tile, c)[:num_tiles]
        x = x.reshape(tiles_y, tiles_x, rc.TILE_Y, rc.TILE_X, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(tiles_y * rc.TILE_Y, tiles_x * rc.TILE_X, c)
        return x[:h, :w].astype(dtype)

    return dict(
        face_idx=assemble(face_t[..., None], 1, jnp.int32)[..., 0],
        zbuf=assemble(z_t[..., None], 1, jnp.float32)[..., 0],
        bary=assemble(bary_t, 3, jnp.float32),
        overflow=jnp.maximum(total - dup_capacity, 0),
    )


def rasterize_mesh(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    camera: Camera,
    dup_capacity: int = 2**20,
    k_max: int = 256,
    tile_chunk: int = 64,
) -> dict:
    """Rasterize a triangle mesh. Returns dict(face_idx (H,W) int32 [-1 =
    background], zbuf (H,W) view-z [-1 = background], bary (H,W,3), overflow)."""
    return _rasterize_impl(
        vertices,
        faces.astype(jnp.int32),
        camera.world_view,
        camera.full_proj,
        (camera.height, camera.width, camera.tan_half_fov_x, camera.tan_half_fov_y),
        dup_capacity,
        k_max,
        tile_chunk,
    )
