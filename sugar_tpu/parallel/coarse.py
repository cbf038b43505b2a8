"""Multi-chip coarse-SuGaR training step (SDF / density regularization).

The distributed counterpart of the reference's single-GPU coarse hot loop
(sugar_trainers/coarse_sdf.py:471-757) — the stage SURVEY.md §2.9 row 6
flags as needing sharded KNN and field queries:

- Gaussian buffers (params, Adam moments, the KNN table) are sharded over
  the ``gauss`` mesh axis, exactly as the vanilla path (parallel/train.py).
- The camera batch is sharded over ``data``: each data-group renders a
  different view AND draws its own 1M-sample SDF batch, so the dominant
  per-sample tensors (samples, neighbor gathers, field evals — (B, S, K, 3)
  shaped) stay sharded on ``data`` end to end.
- The loss body is ``trainers.coarse.coarse_loss`` itself — pure jnp, so
  GSPMD inserts the collectives (field-param all-gathers for the neighbor
  lookups, the gradient ``psum`` over ``data``) with single-chip semantics.
  No re-derivation of the schedule or the loss terms.

The KNN-500 refresh uses ``parallel.knn.knn_sharded`` (ring exchange), also
sharded over ``gauss``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sugar_tpu.core.cameras import Camera, Cameras
from sugar_tpu.models.gaussians import GaussianModel, GaussianParams
from sugar_tpu.trainers import optimizer as opt
from sugar_tpu.trainers.coarse import CoarseConfig, coarse_loss


def make_sharded_coarse_step(
    mesh: Mesh,
    cfg: CoarseConfig,
    lrs: dict[str, Callable],
    extent: float,
    dup_capacity: int,
    with_entropy: bool,
    with_sdf: bool,
):
    """Build a jitted multi-camera coarse step over a ('data','gauss') mesh.

    Inputs follow parallel.train.make_sharded_train_step conventions: the
    caller places params/adam/knn_idx on the ``gauss`` axis (shard_params)
    and the camera/gt/rng batch (leading dim B = mesh data size) on the
    ``data`` axis; jit infers in-shardings from the committed arguments.
    """
    gauss = NamedSharding(mesh, P("gauss"))
    data = NamedSharding(mesh, P("data"))
    spatial_extent = float(extent)

    def step_fn(
        params: GaussianParams,
        alive: jnp.ndarray,
        adam: opt.AdamState,
        knn_idx: jnp.ndarray,  # (capacity, K) sharded on gauss
        cams: Cameras,  # batched (B, ...)
        gts: jnp.ndarray,  # (B, H, W, 3)
        it: jnp.ndarray,
        rngs: jax.Array,  # (B, 2) per-view PRNG keys
    ):
        def loss_fn(p):
            def one(cam, gt, rng):
                return coarse_loss(
                    cfg, p, alive, knn_idx, cam, gt, rng, spatial_extent,
                    dup_capacity, with_entropy, with_sdf,
                )

            loss_b, aux_b = jax.vmap(one, in_axes=(0, 0, 0))(cams, gts, rngs)
            return jnp.mean(loss_b), aux_b

        (loss, aux_b), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.with_sharding_constraint(grads, gauss)
        new_params, new_adam = opt.adam_step(params, grads, adam, it, lrs, cfg.optim)
        aux = dict(
            loss=loss,
            psnr=jnp.mean(aux_b["psnr"]),
            n_visible=jnp.max(aux_b["n_visible"]),
            bin_overflow=jnp.sum(aux_b["bin_overflow"]),
            tile_overflow=jnp.sum(aux_b["tile_overflow"]),
        )
        return new_params, new_adam, aux

    return jax.jit(step_fn, donate_argnums=(0, 2))


def train_coarse_sharded(
    mesh: Mesh,
    model: GaussianModel,
    scene_cameras: list[Camera],
    scene_images: list[np.ndarray],
    extent: float,
    cfg: CoarseConfig,
    seed: int = 0,
    log_fn: Callable[[dict], None] | None = None,
) -> GaussianModel:
    """Multi-chip coarse training loop over a ('data','gauss') mesh.

    The multi-chip generalization of trainers.coarse.train_coarse: each
    optimizer step consumes ``n_data`` views (iteration counting stays in
    per-view units so the schedule boundaries — entropy window, prune_at,
    sdf start, KNN cadence, coarse_sdf.py:468-561 — hit the reference
    iterations); Gaussian buffers, Adam moments and the KNN table live on
    the ``gauss`` axis; the KNN-500 refresh runs the ring-exchange
    knn_sharded.
    """
    from sugar_tpu.parallel.knn import knn_sharded
    from sugar_tpu.parallel.mesh import shard_params
    from sugar_tpu.trainers.schedule import iteration_key

    n_data = mesh.shape["data"]
    capacity = model.capacity
    gauss = NamedSharding(mesh, P("gauss"))
    data = NamedSharding(mesh, P("data"))
    knn_mesh = Mesh(
        np.asarray(mesh.devices).reshape(-1), ("gauss",)
    )

    lrs = opt.group_lrs(cfg.optim, spatial_lr_scale=extent)
    dup_capacity = cfg.dup_capacity_mult * capacity

    adam0 = opt.init_adam(model.params)
    params = shard_params(jax.tree.map(jnp.copy, model.params), mesh)
    adam = dataclasses.replace(
        shard_params(dataclasses.replace(adam0, count=None), mesh),
        count=adam0.count,
    )
    alive = jax.device_put(model.alive, gauss)
    knn_idx = None

    order_rng = np.random.default_rng(seed)
    cam_order: list[int] = []
    step_cache: dict = {}
    t0 = time.time()

    it = cfg.start_iteration
    while it < cfg.num_iterations:
        iteration = it + 1
        with_entropy = cfg.entropy_start < iteration < cfg.entropy_end
        with_sdf = iteration > cfg.start_sdf_estimation_from
        needs_knn = iteration > cfg.regularize_from

        if needs_knn and (
            knn_idx is None
            or (iteration % cfg.reset_neighbors_every) < n_data
        ):
            _, ki = knn_sharded(
                knn_mesh, "gauss", params.xyz, params.xyz,
                k=cfg.knn_to_track, ref_mask=alive,
            )
            knn_idx = jax.device_put(jnp.asarray(ki), gauss)
        if knn_idx is None:
            knn_idx = jax.device_put(
                jnp.zeros((capacity, cfg.knn_to_track), jnp.int32), gauss
            )

        key = (with_entropy, with_sdf)
        if key not in step_cache:
            step_cache[key] = make_sharded_coarse_step(
                mesh, cfg, lrs, extent, dup_capacity, with_entropy, with_sdf
            )

        batch_idx = []
        while len(batch_idx) < n_data:
            if not cam_order:
                cam_order = list(order_rng.permutation(len(scene_cameras)))
            batch_idx.append(cam_order.pop())
        cams = jax.tree.map(
            lambda x: jax.device_put(x, data),
            Cameras.stack([scene_cameras[i] for i in batch_idx]),
        )
        gts = jax.device_put(
            jnp.asarray(np.stack([scene_images[i] for i in batch_idx])), data
        )
        rngs = jnp.stack(
            [jax.random.key_data(iteration_key(seed, it + j)) for j in range(n_data)]
        )
        params, adam, aux = step_cache[key](
            params, alive, adam, knn_idx, cams, gts,
            jnp.asarray(it, jnp.int32), rngs,
        )

        prev_it = it
        it += n_data
        for p_at in cfg.prune_at:
            if prev_it < p_at <= it:
                op = jax.nn.sigmoid(params.opacity_logit)
                alive = alive & (op >= cfg.prune_hard_opacity_threshold)
                alive = jax.device_put(alive, gauss)
                _, ki = knn_sharded(
                    knn_mesh, "gauss", params.xyz, params.xyz,
                    k=cfg.knn_to_track, ref_mask=alive,
                )
                knn_idx = jax.device_put(jnp.asarray(ki), gauss)

        if log_fn and ((it % max(cfg.log_every, 1)) < n_data):
            log_fn(
                dict(
                    iter=it,
                    loss=float(aux["loss"]),
                    psnr=float(aux["psnr"]),
                    n_alive=int(jnp.sum(alive)),
                    elapsed_s=time.time() - t0,
                    mesh=str(dict(mesh.shape)),
                )
            )

    return dataclasses.replace(
        model,
        params=jax.tree.map(lambda x: jnp.asarray(x), params),
        alive=jnp.asarray(alive),
    )
