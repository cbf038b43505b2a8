"""Refinement training: joint mesh-vertex + surface-Gaussian optimization.

Reference semantics (sugar_trainers/refine.py:17-894): bind SuGaR to the
extracted mesh (bind_to_surface_mesh, :156-178) and optimize vertex
positions, 2D scales, in-plane rotations, opacities, SH through the
rasterizer. Loss = RGB (0.8 L1 + 0.2 DSSIM) + 0.1 * mesh normal
consistency (:774-783). No densification (:173-175). Vertex LR uses the
standard exponential schedule with spatial_lr_scale = 10 * bbox_radius /
sqrt(n_vertices) (:455-460); position_lr_* are scaled by 0.01 relative to
free-Gaussian training (coarse_sdf.py:... bind branch sets
position_lr_init*0.01).
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
from sugar_tpu.models.gaussians import GaussianParams
from sugar_tpu.raster import adaptive
from sugar_tpu.raster import common as rcm
from sugar_tpu.raster.api import rasterize_gaussians
from sugar_tpu.refine import bound as B
from sugar_tpu.trainers import optimizer as opt
from sugar_tpu.trainers.schedule import CameraSchedule
from sugar_tpu.utils import checkpoint as ckpt
from sugar_tpu.utils import losses


@dataclasses.dataclass
class RefineConfig:
    num_iterations: int = 15_000  # 'long'; 'medium'=7000, 'short'=2000
    n_gaussians_per_triangle: int = 1
    dssim_factor: float = 0.2
    normal_consistency_factor: float = 0.1
    sh_degree: int = 3
    sh_warmup_every: int = 1_000
    white_background: bool = False
    k_max: int = 1024
    dup_capacity_mult: int = 8
    # 'auto' = fused Pallas kernel on TPU, tiled elsewhere.
    render_mode: str = "auto"
    log_every: int = 50
    # reference refine position lrs = vanilla * 0.01 (coarse_sdf.py bind
    # branch / refine.py).
    position_lr_init: float = 0.00016 * 0.01
    position_lr_final: float = 0.0000016 * 0.01
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15
    # Reference refine milestones (refine.py:227): 2000/7000/15000.
    checkpoint_iterations: tuple = (2_000, 7_000, 15_000)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BoundAdamState:
    mu: B.BoundParams
    nu: B.BoundParams
    count: jnp.ndarray


def init_bound_adam(params: B.BoundParams) -> BoundAdamState:
    z = jax.tree.map(jnp.zeros_like, params)
    return BoundAdamState(mu=z, nu=jax.tree.map(jnp.zeros_like, params), count=jnp.zeros((), jnp.int32))


def bound_lrs(cfg: RefineConfig, spatial_lr_scale: float):
    sched = opt.expon_lr_schedule(
        cfg.position_lr_init * spatial_lr_scale,
        cfg.position_lr_final * spatial_lr_scale,
        30_000,
        lr_delay_mult=0.01,
    )
    const = lambda v: (lambda step: jnp.full((), v, jnp.float32))
    return dict(
        vertices=sched,
        log_scales=const(cfg.scaling_lr),
        complex_rot=const(cfg.rotation_lr),
        opacity_logit=const(cfg.opacity_lr),
        sh_dc=const(cfg.feature_lr),
        sh_rest=const(cfg.feature_lr / 20.0),
    )


def bound_adam_step(params, grads, state, step, lrs, cfg: RefineConfig):
    count = state.count + 1
    b1, b2 = cfg.beta1, cfg.beta2
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)
    new_p, new_mu, new_nu = {}, {}, {}
    for f in dataclasses.fields(B.BoundParams):
        name = f.name
        p = getattr(params, name)
        g = getattr(grads, name)
        mu = b1 * getattr(state.mu, name) + (1 - b1) * g
        nu = b2 * getattr(state.nu, name) + (1 - b2) * g * g
        lr = lrs[name](step)
        new_p[name] = p - lr * (mu / c1) / (jnp.sqrt(nu / c2) + cfg.eps)
        new_mu[name] = mu
        new_nu[name] = nu
    return B.BoundParams(**new_p), BoundAdamState(
        mu=B.BoundParams(**new_mu), nu=B.BoundParams(**new_nu), count=count
    )


def render_bound(
    params: B.BoundParams,
    bm: B.BoundMesh,
    camera: Camera,
    active_sh_degree: int,
    bg: jnp.ndarray,
    dup_capacity: int,
    k_max: int,
    mode: str = "auto",
    tile_cap: int | None = None,
    cap_a: int = 4,
    big_cap: int | None = None,
):
    arrs = B.to_gaussian_arrays(params, bm)
    settings = dataclasses.replace(
        rcm.from_camera(camera, bg=bg), sh_degree=active_sh_degree
    )
    k = (active_sh_degree + 1) ** 2
    return rasterize_gaussians(
        arrs["centers"],
        arrs["opacities"],
        settings,
        scales=arrs["scales"],
        quaternions=arrs["quaternions"],
        shs=arrs["sh"][:, :, :k],
        mode=mode,
        dup_capacity=dup_capacity,
        k_max=k_max,
        tile_cap=tile_cap,
        cap_a=cap_a,
        big_cap=big_cap,
    )


def refine_loss(
    cfg: RefineConfig,
    p: B.BoundParams,
    bm: B.BoundMesh,
    pairs: jnp.ndarray,
    camera: Camera,
    gt: jnp.ndarray,
    active_sh_degree: int,
    dup_capacity: int,
    k_max: int | None = None,
    render_mode: str | None = None,
    tile_cap: int | None = None,
    cap_a: int = 4,
    big_cap: int | None = None,
):
    """One view's refinement loss (RGB + normal consistency,
    refine.py:553-587, 774-783). Pure jnp — shared by the single-chip step
    below and the multi-chip parallel.refine step (GSPMD shards it with
    identical semantics)."""
    if k_max is None:
        k_max = cfg.k_max
    if render_mode is None:
        render_mode = cfg.render_mode
    bg = jnp.full((3,), 1.0 if cfg.white_background else 0.0, jnp.float32)
    out = render_bound(
        p, bm, camera, active_sh_degree, bg, dup_capacity, k_max,
        mode=render_mode, tile_cap=tile_cap, cap_a=cap_a, big_cap=big_cap,
    )
    img = jnp.clip(out["image"], 0.0, 1.0)
    loss = (1 - cfg.dssim_factor) * losses.l1_loss(img, gt) + cfg.dssim_factor * (
        1.0 - losses.ssim(img, gt)
    )
    loss = loss + cfg.normal_consistency_factor * B.normal_consistency_loss(
        p.vertices, bm.faces, pairs
    )
    aux = dict(psnr=losses.psnr(img, gt))
    aux.update({k: out[k] for k in adaptive._OVF_KEYS if k in out})
    return loss, aux


def make_refine_step(
    cfg: RefineConfig,
    bm: B.BoundMesh,
    pairs: jnp.ndarray,
    lrs,
    active_sh_degree: int,
    caps: adaptive.RasterCaps,
):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params: B.BoundParams, adam: BoundAdamState, camera: Camera, gt, it):
        def loss_fn(p):
            return refine_loss(
                cfg, p, bm, pairs, camera, gt, active_sh_degree,
                caps.dup_capacity, k_max=caps.k_max, tile_cap=caps.tile_cap,
                cap_a=caps.cap_a, big_cap=caps.big_cap,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params, new_adam = bound_adam_step(params, grads, adam, it, lrs, cfg)
        aux["loss"] = loss
        return new_params, new_adam, aux

    return step_fn


def refined_training(
    vertices: np.ndarray,
    faces: np.ndarray,
    vertex_colors: np.ndarray | None,
    cameras: list[Camera],
    images: list[np.ndarray],
    extent: float,
    cfg: RefineConfig = RefineConfig(),
    seed: int = 0,
    log_fn: Callable[[dict], None] | None = None,
    init_sh_dc: np.ndarray | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> tuple[B.BoundParams, B.BoundMesh]:
    """Run refinement; returns the optimized bound parameters.

    With ``checkpoint_dir``, (params, Adam, iteration) are saved at
    ``cfg.checkpoint_iterations`` (reference milestones refine.py:227);
    with ``resume`` training restarts from the latest milestone replaying
    the exact camera order."""
    params, bm = B.init_bound_params(
        vertices, faces, vertex_colors,
        n_gaussians_per_triangle=cfg.n_gaussians_per_triangle,
        extent=extent, sh_degree=cfg.sh_degree,
    )
    if init_sh_dc is not None:
        params = dataclasses.replace(params, sh_dc=jnp.asarray(init_sh_dc))
    pairs = jnp.asarray(B.normal_consistency_pairs(faces))
    # spatial_lr_scale = 10 * bbox_radius / sqrt(V) (refine.py:455-460).
    bbox_radius = 0.5 * float(np.linalg.norm(vertices.max(0) - vertices.min(0)))
    spatial_lr_scale = 10.0 * bbox_radius / np.sqrt(max(len(vertices), 1))
    lrs = bound_lrs(cfg, spatial_lr_scale)
    adam = init_bound_adam(params)
    cap_state = adaptive.CapState(
        adaptive.RasterCaps(
            tile_cap=16,
            dup_capacity=cfg.dup_capacity_mult * params.opacity_logit.shape[0],
            k_max=cfg.k_max,
        ),
        log_fn=log_fn,
    )

    start_iteration = 0
    if checkpoint_dir and resume:
        latest = ckpt.latest_milestone(checkpoint_dir, before=cfg.num_iterations)
        if latest is not None:
            like = dict(params=params, adam=adam, iteration=0)
            st = ckpt.restore_structured(
                ckpt.milestone_path(checkpoint_dir, latest), like
            )
            params, adam = st["params"], st["adam"]
            start_iteration = int(st["iteration"])
            if log_fn:
                log_fn({"event": "resume", "iteration": start_iteration})

    sched = CameraSchedule(seed, len(cameras))
    step_cache: dict[tuple, Callable] = {}
    t0 = time.time()
    prev_aux = None
    hot_until = start_iteration + 50
    gt_cache: dict[int, jnp.ndarray] = {}  # device-resident GT images

    for it in range(start_iteration, cfg.num_iterations):
        deg = min(it // cfg.sh_warmup_every, cfg.sh_degree)
        skey = (deg, cap_state.key())
        if skey not in step_cache:
            step_cache[skey] = make_refine_step(
                cfg, bm, pairs, lrs, deg, cap_state.caps
            )
        ci = sched.index(it)
        gt = gt_cache.get(ci)
        if gt is None:
            gt = gt_cache[ci] = jnp.asarray(images[ci])
        params, adam, aux = step_cache[skey](
            params, adam, cameras[ci], gt, jnp.asarray(it, jnp.int32)
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
        if checkpoint_dir and (it + 1) in cfg.checkpoint_iterations:
            ckpt.save_milestone(
                checkpoint_dir, it + 1,
                dict(params=params, adam=adam, iteration=it + 1),
            )
        if log_fn and ((it + 1) % cfg.log_every == 0):
            log_fn(
                dict(
                    iter=it + 1,
                    loss=float(aux["loss"]),
                    psnr=float(aux["psnr"]),
                    elapsed_s=time.time() - t0,
                )
            )
    return params, bm


def export_refined_ply(params: B.BoundParams, bm: B.BoundMesh, path: str) -> None:
    """Export refined Gaussians as a 3DGS PLY for the web viewer
    (refine.py:877-892 convert_refined_sugar_into_gaussians)."""
    import numpy as np

    from sugar_tpu.io import ply as ply_io

    arrs = B.to_gaussian_arrays(params, bm)
    sh = np.asarray(arrs["sh"])
    ply_io.save_gaussian_ply(
        path,
        xyz=np.asarray(arrs["centers"]),
        sh_dc=sh[:, :, 0],
        sh_rest=sh[:, :, 1:],
        opacity_logit=np.asarray(params.opacity_logit),
        log_scales=np.log(np.maximum(np.asarray(arrs["scales"]), 1e-10)),
        quaternions=np.asarray(arrs["quaternions"]),
    )


def load_refined_state(state_path: str) -> tuple[B.BoundParams, B.BoundMesh]:
    """Load a refined-model ``_state.pkl`` (written by pipeline.run_refine)
    back into (BoundParams, BoundMesh) — the hybrid representation the
    reference evaluates in metrics.py:283-300."""
    import pickle

    import numpy as np

    with open(state_path, "rb") as f:
        st = pickle.load(f)
    params = B.BoundParams(
        vertices=jnp.asarray(st["vertices"]),
        log_scales=jnp.asarray(st["log_scales"]),
        complex_rot=jnp.asarray(st["complex_rot"]),
        opacity_logit=jnp.asarray(st["opacity_logit"]),
        sh_dc=jnp.asarray(st["sh_dc"]),
        sh_rest=jnp.asarray(st["sh_rest"]),
    )
    _, bary = B.BARY_TABLES[st["n_per_triangle"]]
    bm = B.BoundMesh(
        faces=jnp.asarray(np.asarray(st["faces"]).astype(np.int32)),
        bary=jnp.asarray(np.asarray(bary).astype(np.float32)),
        thickness=jnp.asarray(st["thickness"], jnp.float32),
        n_per_triangle=st["n_per_triangle"],
    )
    return params, bm
