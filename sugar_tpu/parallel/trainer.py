"""Multi-chip vanilla 3DGS training driver.

Wraps parallel.train.make_sharded_train_step in a camera-batched loop: each
step consumes ``n_data`` views (one per data-group — the multi-chip
generalization of the reference's batch-of-1 loop), with Gaussian buffers
sharded over the ``gauss`` axis. Densification runs as a jitted global pass
on the sharded buffers (sorts/scatters trigger XLA collectives).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.core.cameras import Camera, Cameras
from sugar_tpu.models import densifier as dens
from sugar_tpu.models.gaussians import GaussianModel, create_from_pcd
from sugar_tpu.parallel.mesh import gauss_sharding, make_mesh, shard_params
from sugar_tpu.parallel.train import make_sharded_train_step
from sugar_tpu.trainers import optimizer as opt
from sugar_tpu.trainers.vanilla import TrainConfig


def train_vanilla_sharded(
    scene_cameras: list[Camera],
    scene_images: list[np.ndarray],
    points: np.ndarray,
    colors: np.ndarray,
    extent: float,
    cfg: TrainConfig,
    n_data: int | None = None,
    n_gauss: int | None = None,
    seed: int = 0,
    log_fn: Callable[[dict], None] | None = None,
) -> GaussianModel:
    """Sharded training loop. ``iterations`` counts per-view updates, so the
    number of optimizer steps is iterations / n_data (same total views seen
    as the single-chip loop)."""
    mesh = make_mesh(n_data=n_data, n_gauss=n_gauss)
    n_data = mesh.shape["data"]

    model = create_from_pcd(points, colors, cfg.capacity, sh_degree=cfg.sh_degree)
    adam = opt.init_adam(model.params)
    stats = dens.DensifyStats.zeros(cfg.capacity)
    lrs = opt.group_lrs(cfg.optim, spatial_lr_scale=extent)
    dup_capacity = cfg.dup_capacity_mult * cfg.capacity

    params = shard_params(model.params, mesh)
    adam = dataclasses.replace(
        shard_params(dataclasses.replace(adam, count=None), mesh), count=adam.count
    )
    stats = shard_params(stats, mesh)
    alive = jax.device_put(model.alive, gauss_sharding(mesh))

    rng = jax.random.PRNGKey(seed)
    order_rng = np.random.default_rng(seed)
    step_cache: dict[int, Callable] = {}
    cam_order: list[int] = []
    t0 = time.time()

    n_steps = max(cfg.iterations // n_data, 1)
    for step_i in range(n_steps):
        it = step_i * n_data
        deg = min(it // cfg.sh_warmup_every, cfg.sh_degree)
        if deg not in step_cache:
            step_cache[deg] = make_sharded_train_step(
                mesh, lrs, cfg.optim, deg, dup_capacity,
                k_max=cfg.k_max, lambda_dssim=cfg.lambda_dssim,
                white_background=cfg.white_background,
            )
        batch_idx = []
        while len(batch_idx) < n_data:
            if not cam_order:
                cam_order = list(order_rng.permutation(len(scene_cameras)))
            batch_idx.append(cam_order.pop())
        cams = Cameras.stack([scene_cameras[i] for i in batch_idx])
        gts = jnp.asarray(np.stack([scene_images[i] for i in batch_idx]))

        params, adam, stats, aux = step_cache[deg](
            params, alive, adam, stats, cams, gts, jnp.asarray(it, jnp.int32)
        )

        it1 = it + n_data
        if cfg.densify_from < it1 <= cfg.densify_until and (
            step_i % max(cfg.densify_every // n_data, 1) == 0 and step_i > 0
        ):
            model = dataclasses.replace(model, params=params, alive=alive)
            rng, sub = jax.random.split(rng)
            mss = cfg.prune_max_screen if it1 > cfg.opacity_reset_every else None
            model, adam, stats, _ = dens.densify_and_prune(
                model, adam, stats, sub, extent,
                grad_threshold=cfg.densify_grad_threshold,
                min_opacity=cfg.prune_min_opacity,
                max_screen_size=mss,
                percent_dense=cfg.percent_dense,
            )
            params, alive = model.params, model.alive

        if log_fn and (step_i % max(cfg.log_every // n_data, 1) == 0):
            log_fn(
                dict(
                    iter=it1,
                    loss=float(aux["loss"]),
                    elapsed_s=time.time() - t0,
                    mesh=str(mesh.shape),
                )
            )

    return dataclasses.replace(model, params=params, alive=alive)
