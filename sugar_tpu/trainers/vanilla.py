"""Vanilla 3DGS training loop (the prerequisite 7k-iteration stage).

Reference semantics (gaussian_splatting/train.py:31-133 +
OptimizationParams): random camera order per epoch, loss = (1-λ)·L1 +
λ·(1-SSIM) with λ=0.2, SH degree warmup +1 per 1000 iters, densify from iter
500 to 15000 every 100 (screen-size pruning only after the first opacity
reset), opacity reset every 3000, exponential position LR.

TPU design: the train step (render + loss + backward + Adam) is one jitted
function over static-capacity buffers; densification is a separate jitted
pass on the same buffers. SH warmup re-specializes the step (4 compiles).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.core.cameras import Camera, Cameras
from sugar_tpu.models import densifier as dens
from sugar_tpu.models.gaussians import GaussianModel, GaussianParams, create_from_pcd
from sugar_tpu.models.render import render_params
from sugar_tpu.raster import adaptive
from sugar_tpu.trainers import optimizer as opt
from sugar_tpu.trainers.schedule import CameraSchedule, iteration_key
from sugar_tpu.utils import checkpoint as ckpt
from sugar_tpu.utils import losses


@dataclasses.dataclass
class TrainConfig:
    iterations: int = 7_000
    lambda_dssim: float = 0.2
    sh_degree: int = 3
    sh_warmup_every: int = 1_000
    densify_from: int = 500
    densify_until: int = 15_000
    densify_every: int = 100
    densify_grad_threshold: float = 0.0002
    opacity_reset_every: int = 3_000
    prune_min_opacity: float = 0.005
    prune_max_screen: float = 20.0
    percent_dense: float = 0.01
    white_background: bool = False
    capacity: int = 2**18
    dup_capacity_mult: int = 12
    k_max: int = 1024
    # 'auto' = fused Pallas kernel on TPU, pure-XLA tiled elsewhere (the
    # reference always trains through its CUDA kernel, coarse_sdf.py:506).
    render_mode: str = "auto"
    optim: opt.OptimConfig = dataclasses.field(default_factory=opt.OptimConfig)
    log_every: int = 200
    # Milestone checkpoint iterations (reference saves at 7000/30000,
    # gaussian_splatting/train.py --save_iterations). Active only when a
    # checkpoint_dir is passed to the trainer.
    checkpoint_iterations: tuple = (7_000,)


def make_train_step(
    cfg: TrainConfig,
    lrs: dict[str, Callable],
    active_sh_degree: int,
    caps: adaptive.RasterCaps,
):
    """Build the jitted train step for one (SH degree, raster caps) pair."""

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def step_fn(
        params: GaussianParams,
        alive: jnp.ndarray,
        adam: opt.AdamState,
        stats: dens.DensifyStats,
        camera: Camera,
        gt: jnp.ndarray,
        it: jnp.ndarray,
    ):
        bg = jnp.full((3,), 1.0 if cfg.white_background else 0.0, jnp.float32)
        ndc_probe = jnp.zeros((params.xyz.shape[0], 2), jnp.float32)

        def loss_fn(p, probe):
            out = render_params(
                p, alive, camera, active_sh_degree, bg,
                ndc_offset=probe, dup_capacity=caps.dup_capacity,
                k_max=caps.k_max, mode=cfg.render_mode,
                tile_cap=caps.tile_cap, cap_a=caps.cap_a, big_cap=caps.big_cap,
            )
            img = jnp.clip(out["image"], 0.0, 1.0)
            loss = (1 - cfg.lambda_dssim) * losses.l1_loss(img, gt) + (
                cfg.lambda_dssim
            ) * (1.0 - losses.ssim(img, gt))
            return loss, out

        (loss, out), (gparams, gprobe) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, ndc_probe)
        new_params, new_adam = opt.adam_step(params, gparams, adam, it, lrs, cfg.optim)
        new_stats = dens.update_stats(stats, gprobe, out["radii"])
        aux = dict(
            loss=loss,
            psnr=losses.psnr(jnp.clip(out["image"], 0, 1), gt),
            radii=out["radii"],
        )
        aux.update({k: out[k] for k in adaptive._OVF_KEYS if k in out})
        return new_params, new_adam, new_stats, aux

    return step_fn


@dataclasses.dataclass
class TrainerState:
    model: GaussianModel
    adam: opt.AdamState
    stats: dens.DensifyStats
    iteration: int


def train_vanilla_3dgs(
    scene_cameras: list[Camera],
    scene_images: list[np.ndarray],
    points: np.ndarray,
    colors: np.ndarray,
    extent: float,
    cfg: TrainConfig,
    eval_cameras: list[Camera] | None = None,
    eval_images: list[np.ndarray] | None = None,
    seed: int = 0,
    log_fn: Callable[[dict], None] | None = None,
    start_iteration: int = 0,
    model: GaussianModel | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    network_gui=None,
    source_path: str = "",
) -> TrainerState:
    """Run the vanilla 3DGS optimization. Cameras may have mixed
    resolutions; each distinct resolution triggers one jit specialization.

    With ``checkpoint_dir``, training state (params, alive, Adam, densify
    stats, iteration) is saved at ``cfg.checkpoint_iterations`` milestones;
    when ``resume`` and a milestone exists, training restarts from the
    latest one and replays the exact camera order / RNG stream of the
    uninterrupted run (SURVEY.md §5 checkpoint/resume)."""
    if model is None:
        model = create_from_pcd(points, colors, cfg.capacity, sh_degree=cfg.sh_degree)
    else:
        # The jitted step donates its buffers; keep the caller's model alive.
        model = dataclasses.replace(model, params=jax.tree.map(jnp.copy, model.params))
    adam = opt.init_adam(model.params)
    stats = dens.DensifyStats.zeros(cfg.capacity)
    lrs = opt.group_lrs(cfg.optim, spatial_lr_scale=extent)
    dup_capacity = cfg.dup_capacity_mult * cfg.capacity
    # Lag-checked capacity auto-grow (raster.adaptive): an overflowing step
    # renders a degraded frame, the next step re-jits with grown caps.
    cap_state = adaptive.CapState(
        adaptive.RasterCaps(
            tile_cap=16, dup_capacity=dup_capacity, k_max=cfg.k_max
        ),
        log_fn=log_fn,
    )

    params, alive = model.params, model.alive
    if checkpoint_dir and resume:
        latest = ckpt.latest_milestone(checkpoint_dir, before=cfg.iterations)
        if latest is not None and latest > start_iteration:
            like = dict(params=params, alive=alive, adam=adam, stats=stats,
                        iteration=0)
            st = ckpt.restore_structured(
                ckpt.milestone_path(checkpoint_dir, latest), like
            )
            params, alive = st["params"], st["alive"]
            adam, stats = st["adam"], st["stats"]
            start_iteration = int(st["iteration"])
            if log_fn:
                log_fn({"event": "resume", "iteration": start_iteration})

    sched = CameraSchedule(seed, len(scene_cameras))

    step_cache: dict[tuple, Callable] = {}
    t0 = time.time()
    prev_aux = None
    hot_until = start_iteration + 50
    # Device-resident GT cache: re-transferring the image every step costs
    # a host->device round trip per iteration (dominant on tunneled TPUs).
    gt_cache: dict[int, jnp.ndarray] = {}

    def _gui_render(msg: dict):
        """Render the live model for an interactive-viewer poll
        (reference gaussian_splatting/train.py:52-65)."""
        from sugar_tpu.models.render import render_model
        from sugar_tpu.viewer.network_gui import camera_from_message

        cam = camera_from_message(msg)
        live = dataclasses.replace(model, params=params, alive=alive)
        return render_model(
            live, cam, dup_capacity=cap_state.caps.dup_capacity,
            k_max=cap_state.caps.k_max,
        )["image"]

    for it in range(start_iteration, cfg.iterations):
        if network_gui is not None:
            # One protocol round per iteration while a viewer is connected;
            # `keep_alive` semantics match the reference (train.py:62-65).
            network_gui.poll(
                _gui_render,
                training_done=False,
                source_path=source_path,
            )
        active_deg = min(it // cfg.sh_warmup_every, cfg.sh_degree)
        skey = (active_deg, cap_state.key())
        if skey not in step_cache:
            step_cache[skey] = make_train_step(cfg, lrs, active_deg, cap_state.caps)
        ci = sched.index(it)
        cam = scene_cameras[ci]
        gt = gt_cache.get(ci)
        if gt is None:
            gt = gt_cache[ci] = jnp.asarray(scene_images[ci])

        params, adam, stats, aux = step_cache[skey](
            params, alive, adam, stats, cam, gt, jnp.asarray(it, jnp.int32)
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

        it1 = it + 1
        if cfg.densify_from < it1 <= cfg.densify_until and it1 % cfg.densify_every == 0:
            model = dataclasses.replace(model, params=params, alive=alive)
            sub = iteration_key(seed, it1)
            mss = (
                cfg.prune_max_screen
                if it1 > cfg.opacity_reset_every
                else None
            )
            model, adam, stats, dinfo = dens.densify_and_prune(
                model, adam, stats, sub, extent,
                grad_threshold=cfg.densify_grad_threshold,
                min_opacity=cfg.prune_min_opacity,
                max_screen_size=mss,
                percent_dense=cfg.percent_dense,
            )
            params, alive = model.params, model.alive
            if log_fn:
                log_fn({"iter": it1, **{k: int(v) for k, v in dinfo.items()}})

        if it1 % cfg.opacity_reset_every == 0 and it1 <= cfg.densify_until:
            model = dataclasses.replace(model, params=params, alive=alive)
            model, adam = dens.reset_opacity(model, adam)
            params = model.params

        if checkpoint_dir and it1 in cfg.checkpoint_iterations:
            ckpt.save_milestone(
                checkpoint_dir, it1,
                dict(params=params, alive=alive, adam=adam, stats=stats,
                     iteration=it1),
            )

        if log_fn and (it1 % cfg.log_every == 0 or it1 == cfg.iterations):
            log_fn(
                {
                    "iter": it1,
                    "loss": float(aux["loss"]),
                    "psnr": float(aux["psnr"]),
                    "n_alive": int(jnp.sum(alive)),
                    "bin_overflow": int(aux["bin_overflow"]),
                    "tile_overflow": int(aux["tile_overflow"]),
                    "elapsed_s": time.time() - t0,
                }
            )

    model = dataclasses.replace(model, params=params, alive=alive)
    return TrainerState(model=model, adam=adam, stats=stats, iteration=cfg.iterations)
