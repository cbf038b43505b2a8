"""SuGaR coarse training: surface-alignment regularization stages.

Faithful TPU recast of sugar_trainers/coarse_sdf.py:17-825 and
coarse_density.py (same skeleton; differences noted inline):

- starts from a trained 3DGS model at iteration 7000 and runs to 15000
  (counter semantics coarse_sdf.py:468-469), densification disabled
  (:71-76), SH warmup off (:208-217);
- loss = 0.8*L1 + 0.2*DSSIM (:101-104);
- entropy regularization on visible opacities, iters (7000, 9000), factor
  0.1 (:106-110, 538-551);
- hard prune of opacity < 0.5 at iter 9000 (:195-198);
- from iter 9000: SDF regularization (:112-152): sample 1M points in
  visible surface-near Gaussians (sigma*1.5), depth map rendered through the
  rasterizer *with* gradients (point_colors = view-z trick, :578-604),
  sdf_estimation_loss (factor 0.2) + sdf_better_normal_loss (factor 0.2);
- KNN(16) refreshed every 500 iterations (:178-185, 553-561).

Mode 'sdf' uses |sdf(x) - |depth - z|| / (extent/10) with density_factor
1/16; mode 'density' (coarse_density.py:124-141, 653-662) uses
|density(x) - exp(-0.5 d^2 / beta^2)| with d the projection of (x - mu) on
the Gaussian normal, density_factor 1, and no close-to-surface masking.

TPU notes: boolean-indexed reference ops become masked means; the step is
jitted per phase (pre/post iter-9000); per-gaussian KNN tables are computed
outside jit at the reference cadence.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.core.cameras import Camera
from sugar_tpu.fields import density as df
from sugar_tpu.fields.knn import knn
from sugar_tpu.models import densifier as dens
from sugar_tpu.models.gaussians import GaussianModel, GaussianParams
from sugar_tpu.models.render import render_params
from sugar_tpu.raster import adaptive
from sugar_tpu.core.quaternions import normalize as quat_normalize, quaternion_apply, quaternion_invert
from sugar_tpu.trainers import optimizer as opt
from sugar_tpu.trainers.schedule import CameraSchedule, iteration_key
from sugar_tpu.utils import checkpoint as ckpt
from sugar_tpu.utils import losses


@dataclasses.dataclass
class CoarseConfig:
    mode: str = "sdf"  # 'sdf' or 'density'
    num_iterations: int = 15_000
    start_iteration: int = 7_000
    dssim_factor: float = 0.2
    # entropy regularization
    entropy_start: int = 7_000
    entropy_end: int = 9_000
    entropy_factor: float = 0.1
    # hard prune
    prune_at: tuple = (9_000,)
    prune_hard_opacity_threshold: float = 0.5
    # sdf regularization
    regularize_from: int = 7_000
    start_sdf_estimation_from: int = 9_000
    sdf_estimation_factor: float = 0.2
    sdf_better_normal_factor: float = 0.2
    n_samples_for_sdf_regularization: int = 1_000_000
    sdf_sampling_scale_factor: float = 1.5
    close_gaussian_threshold: float = 2.0
    knn_to_track: int = 16
    reset_neighbors_every: int = 500
    beta_mode: str = "average"
    sh_degree: int = 3
    white_background: bool = False
    k_max: int = 1024
    dup_capacity_mult: int = 10
    # 'auto' = fused Pallas kernel on TPU, tiled elsewhere.
    render_mode: str = "auto"
    log_every: int = 50
    # Milestone saves (reference: coarse_sdf.py:224, 782-793 saves 15000;
    # 9000 additionally captures the post-prune state).
    checkpoint_iterations: tuple = (9_000, 15_000)
    optim: opt.OptimConfig = dataclasses.field(default_factory=opt.OptimConfig)

    @property
    def density_factor(self) -> float:
        return 1.0 if self.mode == "density" else 1.0 / 16.0

    @property
    def sample_only_close_to_surface(self) -> bool:
        return self.mode == "sdf"


def _entropy(op: jnp.ndarray) -> jnp.ndarray:
    return -op * jnp.log(op + 1e-10) - (1 - op) * jnp.log(1 - op + 1e-10)


def coarse_loss(
    cfg: CoarseConfig,
    p: GaussianParams,
    alive: jnp.ndarray,
    knn_idx: jnp.ndarray,  # (capacity, K) neighbor table
    camera: Camera,
    gt: jnp.ndarray,
    rng: jax.Array,
    spatial_extent: float,
    dup_capacity: int,
    with_entropy: bool,
    with_sdf: bool,
    render_mode: str = "tiled",
    k_max: int | None = None,
    tile_cap: int | None = None,
    cap_a: int = 4,
    big_cap: int | None = None,
):
    """One view's coarse-stage loss (RGB + entropy + SDF/density + normal
    terms). Shared by the single-chip step below and the multi-chip
    parallel.coarse step (pure jnp — GSPMD shards it with the same
    semantics)."""
    if k_max is None:
        k_max = cfg.k_max
    bg = jnp.full((3,), 1.0 if cfg.white_background else 0.0, jnp.float32)
    out = render_params(
        p, alive, camera, cfg.sh_degree, bg,
        dup_capacity=dup_capacity, k_max=k_max, mode=render_mode,
        tile_cap=tile_cap, cap_a=cap_a, big_cap=big_cap,
    )
    img = jnp.clip(out["image"], 0.0, 1.0)
    loss = (1 - cfg.dssim_factor) * losses.l1_loss(img, gt) + (
        cfg.dssim_factor
    ) * (1.0 - losses.ssim(img, gt))
    visible = out["radii"] > 0

    opacities = jax.nn.sigmoid(p.opacity_logit)
    scales = jnp.exp(p.log_scales)
    quats = quat_normalize(p.quaternions)

    if with_entropy:
        vis_f = visible.astype(jnp.float32)
        # where(), not multiply-by-mask: a non-finite opacity in a culled
        # slot would otherwise poison the sum (NaN * 0 = NaN) and report a
        # NaN loss while gradients stay finite elsewhere.
        ent = jnp.sum(jnp.where(visible, _entropy(opacities), 0.0)) / jnp.maximum(
            jnp.sum(vis_f), 1.0
        )
        loss = loss + cfg.entropy_factor * ent

    if with_sdf:
        gp = df.GaussianFieldParams(
            centers=p.xyz, scales=scales, quaternions=quats, opacities=opacities
        )
        # Depth map via the rasterizer (view-z as color, bg = max z;
        # coarse_sdf.py:578-604). Gradients flow through it.
        zs = p.xyz @ camera.world_view[2, :3] + camera.world_view[2, 3]
        max_depth = jnp.max(jnp.where(alive, zs, 0.0))
        depth_img = _render_depth(
            p, alive, camera, zs, max_depth, dup_capacity, k_max,
            mode=render_mode, tile_cap=tile_cap, cap_a=cap_a, big_cap=big_cap,
        )

        sampling_mask = visible
        if cfg.sample_only_close_to_surface:
            # coarse_sdf.py:608-623, all under stop_gradient.
            cam_dir = camera.cam_center[None, :] - p.xyz
            cam_dir = cam_dir / jnp.maximum(
                jnp.linalg.norm(cam_dir, axis=-1, keepdims=True), 1e-12
            )
            local_dir = quaternion_apply(quaternion_invert(quats), cam_dir)
            g_std = jnp.linalg.norm(scales * local_dir, axis=-1)
            pix = _project_to_pixels(p.xyz, camera)
            map_z = df.depth_lookup_bilinear(depth_img, pix)
            close = jnp.abs(map_z - zs) < cfg.close_gaussian_threshold * g_std
            sampling_mask = sampling_mask & jax.lax.stop_gradient(close)

        samples, src_idx = df.sample_points_in_gaussians(
            rng,
            cfg.n_samples_for_sdf_regularization,
            gp,
            alive & sampling_mask,
            sampling_scale_factor=cfg.sdf_sampling_scale_factor,
            prob_proportional_to_volume=False,
        )
        any_sampled = jnp.sum((alive & sampling_mask).astype(jnp.int32)) > 0

        neighbor_idx = knn_idx[src_idx]  # (S, K)
        fields = df.field_values(
            samples,
            neighbor_idx,
            gp,
            density_factor=cfg.density_factor,
            return_sdf=cfg.mode == "sdf",
            beta_mode=cfg.beta_mode,
            chunk=min(65536, cfg.n_samples_for_sdf_regularization),
        )

        normals = df.smallest_axes(scales, quats)  # (N, 3)

        if cfg.mode == "sdf":
            # depth-based estimation (coarse_sdf.py:644-679)
            s_z = samples @ camera.world_view[2, :3] + camera.world_view[2, 3]
            proj_ok = s_z > 0.01  # znear
            s_pix = _project_to_pixels(samples, camera)
            s_map_z = df.depth_lookup_bilinear(depth_img, s_pix)
            sdf_est = s_map_z - s_z
            std = spatial_extent / 10.0
            err = jnp.abs(fields["sdf"] - jnp.abs(sdf_est)) / std
            err = jnp.minimum(err, 10.0 * spatial_extent)
            w = proj_ok.astype(jnp.float32)
            sdf_loss = jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)
        else:
            # projection-based density estimation
            # (coarse_density.py:653-662)
            n_src = normals[src_idx]
            d_proj = jnp.sum((samples - p.xyz[src_idx]) * n_src, axis=-1)
            target = jnp.exp(
                -0.5 * d_proj**2 / jnp.maximum(fields["beta"] ** 2, 1e-12)
            )
            sdf_loss = jnp.mean(jnp.abs(fields["density"] - target))
        loss = loss + jnp.where(
            any_sampled, cfg.sdf_estimation_factor * sdf_loss, 0.0
        )

        # better-normal loss (coarse_sdf.py:688-716)
        cg_idx = neighbor_idx
        cg_min_scale = jax.lax.stop_gradient(
            jnp.min(scales, axis=-1)[cg_idx]
        )
        cg_normals = normals[cg_idx]  # (S, K, 3)
        s_normals = normals[src_idx]  # (S, 3)
        sign = jax.lax.stop_gradient(
            jnp.sign(jnp.sum(cg_normals * s_normals[:, None], axis=-1, keepdims=True))
        )
        cg_normals = cg_normals * sign
        cg_op = jax.lax.stop_gradient(
            _neighbor_opacities(samples, cg_idx, gp, cfg.density_factor)
        )
        nw = jnp.abs(
            jnp.sum((samples[:, None] - p.xyz[cg_idx]) * cg_normals, axis=-1)
        )
        nw = jax.lax.stop_gradient(nw)  # gradient through normals only
        nw = cg_op * nw / jnp.maximum(cg_min_scale, 1e-6) ** 2
        nw_sum = jax.lax.stop_gradient(jnp.sum(nw, axis=-1))
        nw = nw / jnp.maximum(nw_sum, 1e-6)[:, None]
        bn = jnp.sum(
            (s_normals - jnp.sum(nw[..., None] * cg_normals, axis=-2)) ** 2,
            axis=-1,
        )
        loss = loss + jnp.where(
            any_sampled, cfg.sdf_better_normal_factor * jnp.mean(bn), 0.0
        )
    aux = dict(
        loss=loss,
        psnr=losses.psnr(img, gt),
        n_visible=jnp.sum(visible.astype(jnp.int32)),
    )
    aux.update({k: out[k] for k in adaptive._OVF_KEYS if k in out})
    return loss, aux


def make_coarse_step(
    cfg: CoarseConfig,
    lrs: dict[str, Callable],
    extent: float,
    capacity: int,
    with_entropy: bool,
    with_sdf: bool,
    caps: adaptive.RasterCaps,
):
    """Jitted coarse step for one (entropy, sdf, raster caps) phase."""

    spatial_extent = float(extent)

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def step_fn(
        params: GaussianParams,
        alive: jnp.ndarray,
        adam: opt.AdamState,
        knn_idx: jnp.ndarray,  # (capacity, K) neighbor table
        camera: Camera,
        gt: jnp.ndarray,
        it: jnp.ndarray,
        rng: jax.Array,
    ):
        def loss_fn(p: GaussianParams):
            return coarse_loss(
                cfg, p, alive, knn_idx, camera, gt, rng, spatial_extent,
                caps.dup_capacity, with_entropy, with_sdf,
                render_mode=cfg.render_mode, k_max=caps.k_max,
                tile_cap=caps.tile_cap, cap_a=caps.cap_a, big_cap=caps.big_cap,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params, new_adam = opt.adam_step(params, grads, adam, it, lrs, cfg.optim)
        return new_params, new_adam, aux

    return step_fn


def _project_to_pixels(points: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """World points -> pixel coordinates via the camera's full projection."""
    h = points @ camera.full_proj[:, :3].T + camera.full_proj[:, 3]
    ndc = h[:, :2] / jnp.maximum(h[:, 3:4], 1e-7)
    px = ((ndc[:, 0] + 1) * camera.width - 1) * 0.5
    py = ((ndc[:, 1] + 1) * camera.height - 1) * 0.5
    return jnp.stack([px, py], axis=-1)


def _render_depth(params, alive, camera, zs, max_depth, dup_capacity, k_max,
                  mode="tiled", tile_cap=None, cap_a=4, big_cap=None):
    """Depth map through the rasterizer: color channel = view z, background
    = max depth (coarse_sdf.py:578-604)."""
    colors = jnp.broadcast_to(zs[:, None], (zs.shape[0], 3))
    out = render_params_with_colors(
        params, alive, camera, colors,
        bg=jnp.full((3,), 1.0, jnp.float32) * max_depth,
        dup_capacity=dup_capacity, k_max=k_max,
        mode=mode, tile_cap=tile_cap, cap_a=cap_a, big_cap=big_cap,
    )
    return out["image"][..., 0]


def render_params_with_colors(params, alive, camera, colors, bg, dup_capacity,
                              k_max, mode="auto", tile_cap=None, cap_a=4,
                              big_cap=None):
    import dataclasses as dc

    from sugar_tpu.raster import common as rcm
    from sugar_tpu.raster.api import rasterize_gaussians

    settings = dc.replace(rcm.from_camera(camera, bg=bg), sh_degree=0)
    return rasterize_gaussians(
        params.xyz,
        jax.nn.sigmoid(params.opacity_logit),
        settings,
        scales=jnp.exp(params.log_scales),
        quaternions=quat_normalize(params.quaternions),
        colors=colors,
        alive_mask=alive,
        mode=mode,
        dup_capacity=dup_capacity,
        k_max=k_max,
        tile_cap=tile_cap,
        cap_a=cap_a,
        big_cap=big_cap,
    )


def _neighbor_opacities(samples, neighbor_idx, gp, density_factor):
    """Per-sample, per-neighbor gaussian weights (the
    closest_gaussian_opacities field)."""
    isr = df.inv_scaled_rotation(gp.scales, gp.quaternions)
    centers = gp.centers[neighbor_idx]
    shift = samples[:, None, :] - centers
    warped = jnp.einsum("skij,ski->skj", isr[neighbor_idx], shift)
    quad = jnp.clip(jnp.sum(warped * warped, axis=-1), 0.0, 1e8)
    return density_factor * gp.opacities[neighbor_idx] * jnp.exp(-0.5 * quad)


def train_coarse(
    model: GaussianModel,
    scene_cameras: list[Camera],
    scene_images: list[np.ndarray],
    extent: float,
    cfg: CoarseConfig,
    seed: int = 0,
    log_fn: Callable[[dict], None] | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> GaussianModel:
    """Run the coarse stage from a trained 3DGS model (iteration 7000 ->
    15000 by default).

    With ``checkpoint_dir``, state (params, alive, Adam, KNN table,
    iteration) is saved at ``cfg.checkpoint_iterations``; with ``resume``,
    training restarts from the latest milestone replaying the exact camera
    order and per-iteration RNG (SURVEY.md §5)."""
    capacity = model.capacity
    adam = opt.init_adam(model.params)
    lrs = opt.group_lrs(cfg.optim, spatial_lr_scale=extent)
    cap_state = adaptive.CapState(
        adaptive.RasterCaps(
            tile_cap=16, dup_capacity=cfg.dup_capacity_mult * capacity,
            k_max=cfg.k_max,
        ),
        log_fn=log_fn,
    )

    # The jitted step donates its param/adam buffers; copy so the caller's
    # model stays alive (it may be reused across runs).
    params = jax.tree.map(jnp.copy, model.params)
    alive = model.alive
    knn_idx = None
    start_iteration = cfg.start_iteration
    if checkpoint_dir and resume:
        latest = ckpt.latest_milestone(checkpoint_dir, before=cfg.num_iterations)
        if latest is not None and latest > start_iteration:
            like = dict(
                params=params, alive=alive, adam=adam,
                knn_idx=jnp.zeros((capacity, cfg.knn_to_track), jnp.int32),
                iteration=0,
            )
            st = ckpt.restore_structured(
                ckpt.milestone_path(checkpoint_dir, latest), like
            )
            params, alive, adam = st["params"], st["alive"], st["adam"]
            knn_idx = st["knn_idx"]
            start_iteration = int(st["iteration"])
            if log_fn:
                log_fn({"event": "resume", "iteration": start_iteration})

    sched = CameraSchedule(seed, len(scene_cameras))
    step_cache: dict = {}
    t0 = time.time()
    prev_aux = None
    hot_until = start_iteration + 50
    gt_cache: dict[int, jnp.ndarray] = {}  # device-resident GT images

    for it in range(start_iteration, cfg.num_iterations):
        iteration = it + 1  # reference counts from 1 (coarse_sdf.py:468)

        with_entropy = cfg.entropy_start < iteration < cfg.entropy_end
        with_sdf = iteration > cfg.start_sdf_estimation_from
        needs_knn = iteration > cfg.regularize_from

        if needs_knn and (
            knn_idx is None or iteration % cfg.reset_neighbors_every == 0
        ):
            _, knn_idx = knn(params.xyz, params.xyz, k=cfg.knn_to_track, ref_mask=alive)
        if knn_idx is None:
            knn_idx = jnp.zeros((capacity, cfg.knn_to_track), jnp.int32)

        key = (with_entropy, with_sdf, cap_state.key())
        if key not in step_cache:
            step_cache[key] = make_coarse_step(
                cfg, lrs, extent, capacity, with_entropy, with_sdf,
                cap_state.caps,
            )

        ci = sched.index(it - cfg.start_iteration)
        sub = iteration_key(seed, it)
        gt = gt_cache.get(ci)
        if gt is None:
            gt = gt_cache[ci] = jnp.asarray(scene_images[ci])
        params, adam, aux = step_cache[key](
            params, alive, adam, knn_idx, scene_cameras[ci],
            gt, jnp.asarray(it, jnp.int32), sub,
        )
        # Lagged overflow check AFTER dispatching this step (readback
        # overlaps device execution). Cadence is adaptive: every step for
        # the 50 iterations after a (re)jit — when growth is likely — then
        # every 10th, so the steady-state loop pays the device->host RTT
        # once per 10 steps instead of per step (dominant on tunneled
        # TPUs). A grown cap takes effect from the next checked iteration.
        if prev_aux is not None and (it < hot_until or it % 10 == 0):
            if cap_state.observe(prev_aux):
                step_cache.clear()
                hot_until = it + 50
        prev_aux = aux

        if iteration in cfg.prune_at:
            op = jax.nn.sigmoid(params.opacity_logit)
            alive = alive & (op >= cfg.prune_hard_opacity_threshold)
            _, knn_idx = knn(params.xyz, params.xyz, k=cfg.knn_to_track, ref_mask=alive)

        if checkpoint_dir and iteration in cfg.checkpoint_iterations:
            ckpt.save_milestone(
                checkpoint_dir, iteration,
                dict(params=params, alive=alive, adam=adam,
                     knn_idx=knn_idx, iteration=iteration),
            )

        if log_fn and (iteration % cfg.log_every == 0):
            log_fn(
                dict(
                    iter=iteration,
                    loss=float(aux["loss"]),
                    psnr=float(aux["psnr"]),
                    n_alive=int(jnp.sum(alive)),
                    elapsed_s=time.time() - t0,
                )
            )

    return dataclasses.replace(model, params=params, alive=alive)
