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

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sugar_tpu.core.cameras import Cameras
from sugar_tpu.models.gaussians import GaussianParams
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
