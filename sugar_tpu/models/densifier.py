"""Static-shape densification: clone / split / prune / opacity-reset.

Reference semantics (sugar_scene/sugar_densifier.py:156-251 +
gaussian_splatting/scene/gaussian_model.py:282-407) under XLA static shapes
(SURVEY.md §7 hard part #3): instead of reallocating tensors, Gaussians live
in fixed-capacity buffers with an ``alive`` mask; clone/split write children
into dead slots found by a stable argsort (device-side "free-list"), and
Adam moment buffers are zeroed at the written slots, exactly like the
reference's cat_tensors_to_optimizer / _prune_optimizer surgery.

Criteria (all thresholds identical to the reference):
- densify: mean screen-space NDC-grad norm >= grad_threshold (0.0002);
  clone if max(scale) <= percent_dense * extent (copy in place), else split
  into n_split=2 children sampled from the Gaussian, scales /= 1.6, parent
  pruned.
- prune: opacity < min_opacity (0.005), or (when screen-size pruning is on)
  2D radius > max_screen px or world scale > 0.1 * extent.
- reset_opacity: clamp opacity to <= 0.01 and zero the opacity Adam moments.

If there are more candidates than free slots, the lowest-priority candidates
are dropped (reported via ``n_dropped``) — the capacity analog of CUDA's
unbounded realloc.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sugar_tpu.core.quaternions import quaternion_to_matrix
from sugar_tpu.models.gaussians import GaussianModel, GaussianParams, inverse_sigmoid
from sugar_tpu.trainers.optimizer import AdamState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DensifyStats:
    """Accumulated screen-space gradient stats (sugar_densifier.py:134-164)."""

    grad_accum: jnp.ndarray  # (N,) sum of NDC-grad norms
    denom: jnp.ndarray  # (N,) number of visible updates
    max_radii: jnp.ndarray  # (N,) float32 max 2D radius seen

    @staticmethod
    def zeros(capacity: int) -> "DensifyStats":
        return DensifyStats(
            grad_accum=jnp.zeros((capacity,), jnp.float32),
            denom=jnp.zeros((capacity,), jnp.float32),
            max_radii=jnp.zeros((capacity,), jnp.float32),
        )


def update_stats(
    stats: DensifyStats, ndc_grad: jnp.ndarray, radii: jnp.ndarray
) -> DensifyStats:
    """Accumulate after a backward pass; ``ndc_grad`` is the cotangent of the
    rasterizer's ndc_offset (= CUDA viewspace_point_tensor.grad)."""
    visible = radii > 0
    norm = jnp.linalg.norm(ndc_grad[:, :2], axis=-1)
    return DensifyStats(
        grad_accum=stats.grad_accum + jnp.where(visible, norm, 0.0),
        denom=stats.denom + visible.astype(jnp.float32),
        max_radii=jnp.maximum(stats.max_radii, jnp.where(visible, radii.astype(jnp.float32), 0.0)),
    )


def _alloc_slots(free_mask: jnp.ndarray, want_mask: jnp.ndarray, priority: jnp.ndarray):
    """Map the i-th wanted slot (by descending priority) to the i-th free
    slot. Returns (dest (N,) int32 — capacity where invalid, granted (N,)
    bool aligned with want_mask)."""
    n = free_mask.shape[0]
    n_free = jnp.sum(free_mask.astype(jnp.int32))
    # Free slots in index order.
    free_order = jnp.argsort(~free_mask, stable=True).astype(jnp.int32)  # free first
    # Rank wanted slots by priority (desc) so overflow drops the weakest.
    neg_prio = jnp.where(want_mask, -priority, jnp.inf)
    want_order = jnp.argsort(neg_prio, stable=True).astype(jnp.int32)
    rank_of = jnp.zeros((n,), jnp.int32).at[want_order].set(jnp.arange(n, dtype=jnp.int32))
    granted = want_mask & (rank_of < n_free)
    dest = jnp.where(granted, free_order[jnp.clip(rank_of, 0, n - 1)], n)
    return dest, granted


def _scatter_params(params: GaussianParams, src_tree: GaussianParams, src_idx_dest: jnp.ndarray):
    """Scatter rows of src_tree into dest slots (mode='drop' ignores
    out-of-range dest = capacity)."""
    return jax.tree.map(
        lambda p, s: p.at[src_idx_dest].set(s, mode="drop"), params, src_tree
    )


def densify_and_prune(
    model: GaussianModel,
    adam: AdamState,
    stats: DensifyStats,
    rng: jax.Array,
    extent: jnp.ndarray | float,
    grad_threshold: float = 0.0002,
    min_opacity: float = 0.005,
    max_screen_size: float | None = None,
    percent_dense: float = 0.01,
    n_split: int = 2,
    split_scale_div: float = 1.6,
) -> tuple[GaussianModel, AdamState, DensifyStats, dict]:
    """One densify+prune pass. Returns (model, adam, fresh stats, info)."""
    p = model.params
    alive_pre = model.alive
    alive = alive_pre
    n = alive.shape[0]

    grads = jnp.where(stats.denom > 0, stats.grad_accum / jnp.maximum(stats.denom, 1.0), 0.0)
    scales = jnp.exp(p.log_scales)
    max_scale = jnp.max(scales, axis=-1)
    high_grad = alive & (grads >= grad_threshold)
    clone_mask = high_grad & (max_scale <= percent_dense * extent)
    split_mask = high_grad & (max_scale > percent_dense * extent)

    zeros_like_params = jax.tree.map(jnp.zeros_like, p)
    fresh = jnp.zeros((n,), bool)  # slots (re)written this pass

    # ---- clone: copy candidates into free slots (gaussian_model.py:349-365)
    dest_c, granted_c = _alloc_slots(~alive, clone_mask, grads)
    new_params = _scatter_params(p, p, dest_c)
    new_mu = _scatter_params(adam.mu, zeros_like_params, dest_c)
    new_nu = _scatter_params(adam.nu, zeros_like_params, dest_c)
    alive = alive.at[dest_c].set(True, mode="drop")
    fresh = fresh.at[dest_c].set(True, mode="drop")

    # ---- split: sample n_split children from each parent
    # (gaussian_model.py:320-347): child xyz ~ N(mean, Sigma), child scales =
    # scales / (0.8 * n_split); the parent is pruned (its slot becomes free
    # for subsequent children). All reads come from the pre-pass params.
    alive = alive & ~split_mask
    R = quaternion_to_matrix(
        p.quaternions
        / jnp.maximum(jnp.linalg.norm(p.quaternions, axis=-1, keepdims=True), 1e-12)
    )
    child_src = dataclasses.replace(
        p, log_scales=jnp.log(jnp.maximum(scales / (0.8 * n_split), 1e-30))
    )
    info_drop = jnp.zeros((), jnp.int32)
    for _k in range(n_split):
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, (n, 3)) * scales
        child_xyz = p.xyz + jnp.einsum("nij,nj->ni", R, noise)
        dest_s, granted_s = _alloc_slots(~alive, split_mask, grads)
        src_k = dataclasses.replace(child_src, xyz=child_xyz)
        new_params = _scatter_params(new_params, src_k, dest_s)
        new_mu = _scatter_params(new_mu, zeros_like_params, dest_s)
        new_nu = _scatter_params(new_nu, zeros_like_params, dest_s)
        alive = alive.at[dest_s].set(True, mode="drop")
        fresh = fresh.at[dest_s].set(True, mode="drop")
        info_drop += jnp.sum((split_mask & ~granted_s).astype(jnp.int32))

    # ---- prune AFTER densification (reference order,
    # gaussian_model.py:367-377): opacity + world-size checks apply to the
    # post-densification population; the screen-radius check uses accumulated
    # stats, which are only valid for slots not rewritten this pass.
    opacity = jax.nn.sigmoid(new_params.opacity_logit)
    prune = alive & (opacity < min_opacity)
    if max_screen_size is not None:
        prune |= alive & ~fresh & (stats.max_radii > max_screen_size)
        prune |= alive & (jnp.max(jnp.exp(new_params.log_scales), axis=-1) > 0.1 * extent)
    alive = alive & ~prune

    info = dict(
        n_cloned=jnp.sum(granted_c.astype(jnp.int32)),
        n_split=jnp.sum(split_mask.astype(jnp.int32)),
        n_pruned=jnp.sum((prune | split_mask).astype(jnp.int32)),
        n_dropped=info_drop + jnp.sum((clone_mask & ~granted_c).astype(jnp.int32)),
        n_alive=jnp.sum(alive.astype(jnp.int32)),
    )
    new_model = dataclasses.replace(model, params=new_params, alive=alive)
    new_adam = dataclasses.replace(adam, mu=new_mu, nu=new_nu)
    return new_model, new_adam, DensifyStats.zeros(n), info


def reset_opacity(model: GaussianModel, adam: AdamState) -> tuple[GaussianModel, AdamState]:
    """Clamp opacity to <= 0.01 and zero its Adam moments
    (gaussian_model.py:210-214 + replace_tensor_to_optimizer)."""
    op = jax.nn.sigmoid(model.params.opacity_logit)
    new_logit = inverse_sigmoid(jnp.minimum(op, 0.01))
    params = dataclasses.replace(model.params, opacity_logit=new_logit)
    mu = dataclasses.replace(adam.mu, opacity_logit=jnp.zeros_like(new_logit))
    nu = dataclasses.replace(adam.nu, opacity_logit=jnp.zeros_like(new_logit))
    return (
        dataclasses.replace(model, params=params),
        dataclasses.replace(adam, mu=mu, nu=nu),
    )


def prune_low_opacity(model: GaussianModel, threshold: float = 0.5) -> GaussianModel:
    """Hard prune by opacity (SuGaR coarse stage, coarse_sdf.py:487-497 /
    sugar_model.py:791-803 drop_low_opacity_points)."""
    op = jax.nn.sigmoid(model.params.opacity_logit)
    return dataclasses.replace(model, alive=model.alive & (op >= threshold))
