"""Per-group Adam optimizer for Gaussian parameters.

Reference semantics (sugar_scene/sugar_optimizer.py:67-109 and
gaussian_splatting/scene/gaussian_model.py:149-175): Adam with eps=1e-15,
named parameter groups with individual learning rates (sh_rest lr = sh lr /
20), and an exponential position-LR schedule scaled by ``spatial_lr_scale``.

Adam is implemented directly (not via optax) so densification can perform
the reference's "optimizer surgery" — zeroing/permuting the moment buffers
alongside parameter clone/split/prune (sugar_densifier.py:48-128) — as plain
pytree scatters.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.models.gaussians import GaussianParams


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    max_steps: int,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """get_expon_lr_func (sugar_utils/general_utils.py:24-56): log-linear
    interpolation from lr_init to lr_final, optional delayed warmup."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            np.log(max(lr_init, 1e-30)) * (1 - t) + np.log(max(lr_final, 1e-30)) * t
        )
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        lr = delay_rate * log_lerp
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(lr)
        return lr

    return schedule


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Learning rates; defaults = reference OptimizationParams
    (gaussian_splatting/arguments/__init__.py + gs_model.py:33-61)."""

    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdamState:
    mu: GaussianParams
    nu: GaussianParams
    count: jnp.ndarray  # () int32


def init_adam(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params), count=jnp.zeros((), jnp.int32))


def group_lrs(
    cfg: OptimConfig, spatial_lr_scale: float
) -> dict[str, Callable[[jnp.ndarray], jnp.ndarray]]:
    """Per-field LR schedules (constant except xyz)."""
    xyz_sched = expon_lr_schedule(
        cfg.position_lr_init * spatial_lr_scale,
        cfg.position_lr_final * spatial_lr_scale,
        cfg.position_lr_max_steps,
        lr_delay_mult=cfg.position_lr_delay_mult,
    )
    const = lambda v: (lambda step: jnp.full((), v, jnp.float32))
    return dict(
        xyz=xyz_sched,
        sh_dc=const(cfg.feature_lr),
        sh_rest=const(cfg.feature_lr / 20.0),
        opacity_logit=const(cfg.opacity_lr),
        log_scales=const(cfg.scaling_lr),
        quaternions=const(cfg.rotation_lr),
    )


def adam_step(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    step: jnp.ndarray,
    lrs: dict[str, Callable],
    cfg: OptimConfig,
) -> tuple[GaussianParams, AdamState]:
    """One Adam update. Per-slot moments; bias correction uses the global
    step count (moments of newly-allocated slots are zeroed by the
    densifier, matching reference cat_tensors_to_optimizer)."""
    count = state.count + 1
    b1, b2 = cfg.beta1, cfg.beta2
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    new_p, new_mu, new_nu = {}, {}, {}
    for f in dataclasses.fields(GaussianParams):
        name = f.name
        p = getattr(params, name)
        g = getattr(grads, name)
        mu = b1 * getattr(state.mu, name) + (1 - b1) * g
        nu = b2 * getattr(state.nu, name) + (1 - b2) * g * g
        lr = lrs[name](step)
        upd = lr * (mu / c1) / (jnp.sqrt(nu / c2) + cfg.eps)
        new_p[name] = p - upd
        new_mu[name] = mu
        new_nu[name] = nu
    return (
        GaussianParams(**new_p),
        AdamState(mu=GaussianParams(**new_mu), nu=GaussianParams(**new_nu), count=count),
    )
