"""Image losses: L1, L2, windowed SSIM, PSNR.

SSIM matches the reference implementation exactly (sugar_utils/loss_utils.py
:23-63 and gaussian_splatting/utils/loss_utils.py): 11x11 Gaussian window
with sigma 1.5, per-channel depthwise convolution with same-padding,
C1=0.01^2, C2=0.03^2, mean over all pixels.

Images are channel-last (H, W, C) float32 in [0, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """PSNR as in gaussian_splatting/utils/image_utils.py (per-image MSE)."""
    mse = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return g.astype(np.float32)


def _depthwise_blur(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur, same padding, per channel. img: (H, W, C)."""
    g = jnp.asarray(_gaussian_window(window_size, sigma))
    pad = window_size // 2
    x = img.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
    kh = g.reshape(1, 1, window_size, 1)
    kw = g.reshape(1, 1, 1, window_size)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn)
    return x[:, 0].transpose(1, 2, 0)


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over the image (reference loss_utils.py:33-63)."""
    c1, c2 = 0.01**2, 0.03**2
    mu1 = _depthwise_blur(img1, window_size, sigma)
    mu2 = _depthwise_blur(img2, window_size, sigma)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, window_size, sigma) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window_size, sigma) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window_size, sigma) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def rgb_loss_l1_dssim(
    pred: jnp.ndarray, target: jnp.ndarray, dssim_factor: float = 0.2
) -> jnp.ndarray:
    """0.8 * L1 + 0.2 * (1 - SSIM) — the training loss of both the vanilla
    trainer (gaussian_splatting/train.py:91-92) and the SuGaR coarse stages
    (sugar_trainers/coarse_sdf.py:101-104)."""
    return (1.0 - dssim_factor) * l1_loss(pred, target) + dssim_factor * (
        1.0 - ssim(pred, target)
    )
