"""Depth-ordered alpha compositing as vectorized scans (TPU-native core).

The CUDA renderer walks Gaussians front-to-back per pixel with data-dependent
`continue`/`done` branches (forward.cu:261-374). On TPU we recast this as:

  - alpha evaluation for a whole (K gaussians x P pixels) block on the VPU,
  - transmittance via log-space cumulative sums (a parallel scan, not a
    sequential loop),
  - color accumulation as a (P, K) @ (K, C) matmul on the MXU,
  - the early-termination rule (stop when T would drop below 1e-4,
    forward.cu:256-261) as a monotone mask on the *raw* running product,
    which reproduces the CUDA "done" flag exactly (see below).

Why the raw product: CUDA sets a permanent per-pixel `done` flag at the first
Gaussian whose inclusion would push T below T_EPS; afterwards nothing updates
T. Before that first crossing the raw product of (1-alpha) equals the
effective T, and the raw product is monotonically non-increasing, so
`raw_product < T_EPS` marks exactly the first crossing and everything after
it — matching the flag without any sequential state.

All functions are differentiable; the inclusion mask is stop_gradient'ed,
matching the CUDA backward which treats inclusion as constant.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sugar_tpu.raster import common as rc

LOG_T_EPS = math.log(rc.T_EPS)


def alpha_from_conic(
    mean2d: jnp.ndarray,  # (K, 2)
    conic: jnp.ndarray,  # (K, 3) (a, b, c)
    opacity: jnp.ndarray,  # (K,)
    pix: jnp.ndarray,  # (P, 2) pixel coords (integer centers, CUDA pixf)
    valid: jnp.ndarray,  # (K,) bool — padded/overflow slots contribute 0
) -> jnp.ndarray:
    """Evaluate per-(gaussian, pixel) alpha with CUDA skip semantics.

    Returns (K, P) alphas in [0, ALPHA_CLAMP]; skipped samples are exactly 0.
    """
    d = mean2d[:, None, :] - pix[None, :, :]  # (K, P, 2)
    dx, dy = d[..., 0], d[..., 1]
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    raw = opacity[:, None] * jnp.exp(power)
    # Straight-through 0.99 clamp: the CUDA backward ignores the clamp when
    # chaining d(alpha)/d(opacity, power) (backward.cu:509-554), so the
    # value is clamped but the gradient is the unclamped one.
    alpha = raw + jax.lax.stop_gradient(jnp.minimum(rc.ALPHA_CLAMP, raw) - raw)
    keep = (power <= 0.0) & (alpha >= rc.ALPHA_CUTOFF) & valid[:, None]
    return jnp.where(keep, alpha, 0.0)


def composite_block(
    alpha: jnp.ndarray,  # (K, P) depth-ordered alphas (0 = skip)
    color: jnp.ndarray,  # (K, C) per-gaussian features
    log_t: jnp.ndarray,  # (P,) log effective transmittance carried in
    log_p_raw: jnp.ndarray,  # (P,) log raw product carried in
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite one depth-ordered block of K Gaussians over P pixels.

    Returns (color_contrib (P, C), new_log_t, new_log_p_raw, n_included (P,)).
    Chain blocks by threading (log_t, log_p_raw); initialize both to zeros.
    """
    lp = jnp.log1p(-alpha)  # (K, P), 0 where skipped
    log_p_incl = log_p_raw[None, :] + jnp.cumsum(lp, axis=0)  # (K, P)
    include = jax.lax.stop_gradient(log_p_incl >= LOG_T_EPS)
    a_eff = alpha * include
    lp_eff = jnp.log1p(-a_eff)
    # Exclusive cumsum for transmittance *before* each Gaussian.
    log_t_in = log_t[None, :] + jnp.cumsum(lp_eff, axis=0) - lp_eff
    w = a_eff * jnp.exp(log_t_in)  # (K, P)
    contrib = jnp.einsum("kp,kc->pc", w, color)  # MXU matmul
    new_log_t = log_t + jnp.sum(lp_eff, axis=0)
    new_log_p = log_p_raw + jnp.sum(lp, axis=0)
    n_inc = jnp.sum((a_eff > 0.0).astype(jnp.int32), axis=0)
    return contrib, new_log_t, new_log_p, n_inc


def composite_depth_ordered(
    alpha: jnp.ndarray,  # (K, P) full depth-ordered alphas
    color: jnp.ndarray,  # (K, C)
    bg: jnp.ndarray,  # (C,)
    block: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite K Gaussians over P pixels in scanned blocks.

    Returns (image (P, C), final_T (P,), n_contrib (P,)).
    """
    k, p = alpha.shape
    pad = (-k) % block
    if pad:
        alpha = jnp.pad(alpha, ((0, pad), (0, 0)))
        color = jnp.pad(color, ((0, pad), (0, 0)))
    kb = alpha.shape[0] // block
    alpha_b = alpha.reshape(kb, block, p)
    color_b = color.reshape(kb, block, -1)

    def step(carry, xs):
        log_t, log_p, acc, n = carry
        a_blk, c_blk = xs
        contrib, log_t, log_p, n_inc = composite_block(a_blk, c_blk, log_t, log_p)
        return (log_t, log_p, acc + contrib, n + n_inc), None

    init = (
        jnp.zeros((p,), alpha.dtype),
        jnp.zeros((p,), alpha.dtype),
        jnp.zeros((p, color.shape[-1]), alpha.dtype),
        jnp.zeros((p,), jnp.int32),
    )
    (log_t, _, acc, n), _ = jax.lax.scan(step, init, (alpha_b, color_b))
    final_t = jnp.exp(log_t)
    image = acc + final_t[:, None] * bg[None, :]
    return image, final_t, n
