"""Multi-chip sharded training step.

Design (scaling-book style): annotate input shardings, let GSPMD insert the
collectives.

- Camera batch (B, ...) sharded over ``data``: every device group renders a
  different view each step (the multi-chip generalization of the
  reference's batch=1 loop, coarse_sdf.py:480-502). The mean loss's
  backward produces the gradient all-reduce over ``data``.
- Gaussian buffers (capacity, ...) sharded over ``gauss``: preprocess, Adam,
  and densification stats stay sharded; the render's global [tile|depth]
  sort triggers an XLA all-gather along ``gauss``, then per-tile compositing
  proceeds locally and the parameter-gradient scatter reduces back to the
  shards.

All cameras in a batch must share a resolution (one jit specialization per
resolution, as in the single-chip path).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sugar_tpu.core.cameras import Cameras
from sugar_tpu.models import densifier as dens
from sugar_tpu.models.gaussians import GaussianParams
from sugar_tpu.models.render import render_params
from sugar_tpu.trainers import optimizer as opt
from sugar_tpu.utils import losses


def make_sharded_train_step(
    mesh: Mesh,
    lrs: dict[str, Callable],
    optim_cfg: opt.OptimConfig,
    active_sh_degree: int,
    dup_capacity: int,
    k_max: int = 512,
    lambda_dssim: float = 0.2,
    white_background: bool = False,
):
    """Build a pjit'ed multi-camera train step over the mesh."""
    gauss = NamedSharding(mesh, P("gauss"))
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def step_fn(
        params: GaussianParams,
        alive: jnp.ndarray,
        adam: opt.AdamState,
        stats: dens.DensifyStats,
        cams: Cameras,  # batched (B, ...)
        gts: jnp.ndarray,  # (B, H, W, 3)
        it: jnp.ndarray,
    ):
        bg = jnp.full((3,), 1.0 if white_background else 0.0, jnp.float32)
        n = params.xyz.shape[0]
        probe = jnp.zeros((n, 2), jnp.float32)

        def loss_one(p, pr, cam, gt):
            out = render_params(
                p, alive, cam, active_sh_degree, bg,
                ndc_offset=pr, dup_capacity=dup_capacity, k_max=k_max,
            )
            img = jnp.clip(out["image"], 0.0, 1.0)
            loss = (1 - lambda_dssim) * losses.l1_loss(img, gt) + lambda_dssim * (
                1.0 - losses.ssim(img, gt)
            )
            return loss, out["radii"]

        def loss_fn(p, pr):
            lpb, radii = jax.vmap(
                lambda cam, gt: loss_one(p, pr, cam, gt), in_axes=(0, 0)
            )(cams, gts)
            return jnp.mean(lpb), radii

        (loss, radii_b), (gparams, gprobe) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, probe)
        gparams = jax.lax.with_sharding_constraint(gparams, gauss)
        new_params, new_adam = opt.adam_step(params, gparams, adam, it, lrs, optim_cfg)
        radii_max = jnp.max(radii_b, axis=0)
        new_stats = dens.update_stats(stats, gprobe, radii_max)
        return new_params, new_adam, new_stats, dict(loss=loss)

    # Inputs are explicitly device_put onto the mesh by the caller
    # (parallel.mesh.shard_params); jit infers in-shardings from the
    # committed arguments (declaring them here breaks on zero-size leaves
    # like a degree-0 sh_rest, which cannot carry a 'gauss' spec). The
    # with_sharding_constraint above keeps gradients on the gauss axis.
    return jax.jit(step_fn, donate_argnums=(0, 2))


def make_tile_sharded_train_step(
    mesh: Mesh,
    axis: str,
    lrs: dict[str, Callable],
    optim_cfg: opt.OptimConfig,
    active_sh_degree: int,
    tile_cap: int = 16,
    route_cap: int | None = None,
    k_max: int = 8192,
    lambda_dssim: float = 0.2,
    white_background: bool = False,
    use_kernel: bool | str = "auto",
):
    """Single-view train step with ALL devices cooperating on one render:
    Gaussian shards + image tile bands over ``axis`` (parallel.render).

    This is the multi-chip execution of the reference's batch=1 iteration
    (coarse_sdf.py:480-502): the tile-sharded path keeps every chip busy on
    the same view, instead of giving each data-group a different view.
    """
    from sugar_tpu.parallel.render import render_sharded

    def step_fn(
        params: GaussianParams,
        alive: jnp.ndarray,
        adam: opt.AdamState,
        stats: dens.DensifyStats,
        cam,  # single Camera (replicated pytree of scalars/arrays)
        gt: jnp.ndarray,  # (H, W, 3)
        it: jnp.ndarray,
    ):
        import dataclasses as dc

        from sugar_tpu.raster import common as rcm

        bg = jnp.full((3,), 1.0 if white_background else 0.0, jnp.float32)
        settings = dc.replace(
            rcm.from_camera(cam, bg=bg), sh_degree=active_sh_degree
        )
        n = params.xyz.shape[0]
        probe = jnp.zeros((n, 2), jnp.float32)
        k = (active_sh_degree + 1) ** 2

        def loss_fn(p, pr):
            from sugar_tpu.models.gaussians import quat_normalize

            sh = jnp.concatenate([p.sh_dc[:, :, None], p.sh_rest], axis=-1)
            out = render_sharded(
                mesh, axis,
                p.xyz,
                jax.nn.sigmoid(p.opacity_logit),
                settings,
                scales=jnp.exp(p.log_scales),
                quaternions=quat_normalize(p.quaternions),
                shs=sh[:, :, :k],
                alive_mask=alive,
                ndc_offset=pr,
                tile_cap=tile_cap,
                route_cap=route_cap,
                k_max=k_max,
                use_kernel=use_kernel,
            )
            img = jnp.clip(out["image"], 0.0, 1.0)
            loss = (1 - lambda_dssim) * losses.l1_loss(img, gt) + lambda_dssim * (
                1.0 - losses.ssim(img, gt)
            )
            ovf = dict(
                route_overflow=out["route_overflow"],
                tile_overflow=out["tile_overflow"],
                kmax_overflow=out["kmax_overflow"],
            )
            return loss, (out["radii"], ovf)

        (loss, (radii, ovf)), (gparams, gprobe) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, probe)
        new_params, new_adam = opt.adam_step(params, gparams, adam, it, lrs, optim_cfg)
        new_stats = dens.update_stats(stats, gprobe, radii)
        # Overflow counters let the training loop trigger the re-jit-with-
        # larger-cap protocol (any nonzero count = dropped duplications).
        return new_params, new_adam, new_stats, dict(loss=loss, **ovf)

    return jax.jit(step_fn, donate_argnums=(0, 2))
