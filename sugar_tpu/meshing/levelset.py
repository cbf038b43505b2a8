"""Level-set surface point sampling from camera depth maps.

TPU recast of SuGaR.compute_level_surface_points_from_camera_fast
(sugar_model.py:1848-2083) using the ``use_gaussian_depth`` design
(sugar_model.py:1901-1911, chosen per SURVEY.md §7.6): the depth map comes
from our own splat rasterizer (view-z as color, bg=-1) instead of a second
triangle rasterizer, and each pixel's Gaussian is found by KNN of the
backprojected point. Everything is static-shape; invalid pixels are masked,
not dropped.

Per camera:
1. render depth; pixels with no splat coverage get depth = 1.05 * max;
2. backproject every pixel to world space;
3. 16-NN Gaussian lookup per point; the nearest defines the ray sigma
   (std of that Gaussian along the view ray);
4. sample 21 points in +-3 sigma along the camera ray, evaluate the density
   field (density_factor=1, soft-clamped at 1);
5. find the first crossing of the surface level walking front-to-back and
   linearly interpolate the intersection; normals = -grad density.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.core.cameras import Camera
from sugar_tpu.core.quaternions import quaternion_apply, quaternion_invert
from sugar_tpu.fields import density as df
from sugar_tpu.fields.knn import knn
from sugar_tpu.models.gaussians import GaussianModel
from sugar_tpu.trainers.coarse import render_params_with_colors


@functools.partial(
    jax.jit,
    static_argnames=(
        "surface_level",
        "n_points_in_range",
        "range_size",
        "knn_to_track",
        "dup_capacity",
        "k_max",
    ),
)
def level_surface_points_one_camera(
    params,
    alive: jnp.ndarray,
    camera: Camera,
    surface_level: float = 0.3,
    n_points_in_range: int = 21,
    range_size: float = 3.0,
    knn_to_track: int = 16,
    dup_capacity: int = 2**22,
    k_max: int = 1024,
) -> dict:
    """Returns dict(points (P,3), normals (P,3), gaussian_idx (P,), valid
    (P,) bool, colors_weight ...) with P = H*W (masked)."""
    h, w = camera.height, camera.width
    scales = jnp.exp(params.log_scales)
    quats = params.quaternions / jnp.maximum(
        jnp.linalg.norm(params.quaternions, axis=-1, keepdims=True), 1e-12
    )
    opac = jax.nn.sigmoid(params.opacity_logit)
    gp = df.GaussianFieldParams(
        centers=params.xyz, scales=scales, quaternions=quats, opacities=opac
    )

    # 1. depth map
    zs = params.xyz @ camera.world_view[2, :3] + camera.world_view[2, 3]
    colors = jnp.broadcast_to(zs[:, None], (zs.shape[0], 3))
    depth_out = render_params_with_colors(
        params, alive, camera, colors,
        bg=jnp.full((3,), -1.0, jnp.float32),
        dup_capacity=dup_capacity, k_max=k_max,
    )
    depth = depth_out["image"][..., 0]  # (H, W)
    no_depth = depth < 0.0
    depth = jnp.where(no_depth, jnp.max(depth) * 1.05, depth)

    # 2. backproject pixels (inverse of ndc2Pix + projection_matrix).
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    ndc_x = (2.0 * xs.astype(jnp.float32) + 1.0) / w - 1.0
    ndc_y = (2.0 * ys.astype(jnp.float32) + 1.0) / h - 1.0
    z = depth
    x_cam = ndc_x * camera.tan_half_fov_x * z
    y_cam = ndc_y * camera.tan_half_fov_y * z
    cam_pts = jnp.stack([x_cam, y_cam, z], axis=-1).reshape(-1, 3)
    R_c2w = camera.world_view[:3, :3].T
    world_pts = cam_pts @ R_c2w.T + camera.cam_center  # (P, 3)

    # 3. nearest gaussians per point
    _, cg_idx = knn(world_pts, params.xyz, k=knn_to_track, ref_mask=alive)
    g0 = cg_idx[:, 0]

    cam_dir_g = camera.cam_center[None] - params.xyz
    cam_dir_g = cam_dir_g / jnp.maximum(
        jnp.linalg.norm(cam_dir_g, axis=-1, keepdims=True), 1e-12
    )
    g_std = jnp.linalg.norm(
        scales * quaternion_apply(quaternion_invert(quats), cam_dir_g), axis=-1
    )
    pt_std = g_std[g0]  # (P,)

    # 4. ray samples
    t_range = jnp.linspace(-range_size, range_size, n_points_in_range)
    t_range = t_range[None, :] * pt_std[:, None]  # (P, R)
    ray_dir = world_pts - camera.cam_center
    ray_dir = ray_dir / jnp.maximum(jnp.linalg.norm(ray_dir, axis=-1, keepdims=True), 1e-12)
    samples = world_pts[:, None, :] + t_range[..., None] * ray_dir[:, None, :]
    samples_flat = samples.reshape(-1, 3)
    nbrs = jnp.repeat(cg_idx, n_points_in_range, axis=0)

    dens = df.field_values(
        samples_flat, nbrs, gp, density_factor=1.0, return_sdf=False,
        chunk=min(2**16, samples_flat.shape[0]),
    )["density"]
    dens = jnp.minimum(dens, 1.0)  # soft clamp (values only; no grads here)
    dens = dens.reshape(-1, n_points_in_range)

    # 5. first crossing (sugar_model.py:2016-2052)
    above = dens > surface_level
    first_above = jnp.argmax(above, axis=-1)  # first True (0 if none)
    under0 = dens[:, 0] < surface_level
    valid = under0 & (first_above > 0) & ~no_depth.reshape(-1)

    fa = jnp.maximum(first_above, 1)
    d_hi = jnp.take_along_axis(dens, fa[:, None], axis=1)[:, 0]
    d_lo = jnp.take_along_axis(dens, fa[:, None] - 1, axis=1)[:, 0]
    t_hi = jnp.take_along_axis(t_range, fa[:, None], axis=1)[:, 0]
    t_lo = jnp.take_along_axis(t_range, fa[:, None] - 1, axis=1)[:, 0]
    t_int = (surface_level - d_lo) / jnp.where(
        jnp.abs(d_hi - d_lo) > 1e-12, d_hi - d_lo, 1.0
    ) * (t_hi - t_lo) + t_lo
    pts_int = world_pts + t_int[:, None] * ray_dir

    # 6. normals = -grad density at the intersection
    grad = _density_grad(pts_int, cg_idx, gp)
    normals = -grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-12)

    return dict(
        points=pts_int,
        normals=normals,
        gaussian_idx=g0,
        valid=valid,
        depth=depth,
    )


def _density_grad(x, neighbor_idx, gp):
    # Component-major gathers, like fields.density.field_values: (C*K, 3, 3)
    # row gathers pad 3 -> 128 lanes on TPU (57x HBM expansion, OOM at
    # production scale); (rows, C*K) column gathers are pad-free.
    isr = df.inv_scaled_rotation(gp.scales, gp.quaternions)
    isr9 = isr.reshape(-1, 9).T  # (9, N)
    cen3 = gp.centers.T  # (3, N)

    def chunk_fn(args):
        xc, idx = args  # (C, 3), (C, K)
        c_n, k_n = idx.shape
        flat = idx.reshape(-1)
        mm = isr9[:, flat]  # (9, C*K)
        cen = cen3[:, flat]  # (3, C*K)
        xT = xc.T[:, jnp.repeat(jnp.arange(c_n, dtype=jnp.int32), k_n)]
        shift = xT - cen
        warped = jnp.stack(
            [
                mm[0] * shift[0] + mm[3] * shift[1] + mm[6] * shift[2],
                mm[1] * shift[0] + mm[4] * shift[1] + mm[7] * shift[2],
                mm[2] * shift[0] + mm[5] * shift[1] + mm[8] * shift[2],
            ]
        )
        quad = jnp.clip(jnp.sum(warped * warped, axis=0), 0.0, 1e8)
        w = gp.opacities[flat] * jnp.exp(-0.5 * quad)  # (C*K,)
        sis = jnp.stack(
            [
                mm[0] * warped[0] + mm[1] * warped[1] + mm[2] * warped[2],
                mm[3] * warped[0] + mm[4] * warped[1] + mm[5] * warped[2],
                mm[6] * warped[0] + mm[7] * warped[1] + mm[8] * warped[2],
            ]
        )
        return jnp.sum((w * sis).reshape(3, c_n, k_n), axis=-1).T  # (C, 3)

    m = x.shape[0]
    chunk = 2**16
    pad = (-m) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    ip = jnp.pad(neighbor_idx, ((0, pad), (0, 0)))
    n_chunks = xp.shape[0] // chunk
    out = jax.lax.map(
        chunk_fn, (xp.reshape(n_chunks, chunk, 3), ip.reshape(n_chunks, chunk, -1))
    )
    return out.reshape(-1, 3)[:m]


def collect_surface_points(
    model: GaussianModel,
    cameras: list[Camera],
    surface_level: float = 0.3,
    total_points: int = 10_000_000,
    rng: np.random.Generator | None = None,
    dup_capacity: int = 2**22,
    k_max: int = 1024,
    colors_per_gaussian: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """Accumulate the level-set point cloud over all training cameras
    (sugar_extractors/coarse_mesh.py:230-327): up to total/n_cams valid
    points per camera, with normals, colors and source gaussian ids."""
    rng = rng or np.random.default_rng(0)
    per_cam = total_points // max(len(cameras), 1)
    pts, nrm, gid, cols = [], [], [], []
    for cam in cameras:
        out = level_surface_points_one_camera(
            model.params, model.alive, cam,
            surface_level=surface_level,
            dup_capacity=dup_capacity, k_max=k_max,
        )
        valid = np.asarray(out["valid"])
        idx = np.nonzero(valid)[0]
        if len(idx) > per_cam:
            idx = rng.choice(idx, size=per_cam, replace=False)
        pts.append(np.asarray(out["points"])[idx])
        nrm.append(np.asarray(out["normals"])[idx])
        g = np.asarray(out["gaussian_idx"])[idx]
        gid.append(g)
        if colors_per_gaussian is not None:
            cols.append(colors_per_gaussian[g])
    return dict(
        points=np.concatenate(pts) if pts else np.zeros((0, 3), np.float32),
        normals=np.concatenate(nrm) if nrm else np.zeros((0, 3), np.float32),
        gaussian_idx=np.concatenate(gid) if gid else np.zeros((0,), np.int64),
        colors=np.concatenate(cols) if cols else None,
    )
