"""Evaluation: PSNR / SSIM / LPIPS over the held-out split.

Reference protocol (metrics.py:154-417 + BASELINE.md): every-8th-image test
split, full-resolution renders capped at 1920 px, PSNR per image then
averaged, SSIM with the 11x11/sigma-1.5 window, LPIPS with a VGG backbone.

LPIPS needs pretrained VGG weights; this environment has no network egress,
so :func:`lpips` accepts a weights file (npz) and degrades to ``None``
when absent — the JSON report then carries psnr/ssim only, with the same
schema as the reference writer (metrics.py:399-417).
"""

from __future__ import annotations

import json
import os
from typing import Callable

import jax.numpy as jnp
import numpy as np

from sugar_tpu.utils import losses


def evaluate_renders(
    render_fn: Callable[[int], np.ndarray],
    gt_images: list[np.ndarray],
    indices: list[int],
    lpips_weights: str | None = None,
) -> dict:
    """Evaluate render_fn(camera_index) against ground truth on `indices`.

    LPIPS is only reported as ``lpips`` when the weights file carries
    calibrated heads; uncalibrated placeholder files (written by
    export_lpips_weights --allow-uncalibrated) are reported under
    ``lpips_uncalibrated`` so they can never masquerade as the metric."""
    psnrs, ssims, lpips_vals = [], [], []
    lp = make_lpips(lpips_weights) if lpips_weights else None
    lpips_key = "lpips"
    if lp is not None and lpips_weights and not _weights_calibrated(lpips_weights):
        lpips_key = "lpips_uncalibrated"
    for i in indices:
        img = np.clip(np.asarray(render_fn(i)), 0.0, 1.0)
        gt = np.clip(gt_images[i], 0.0, 1.0)
        psnrs.append(float(losses.psnr(jnp.asarray(img), jnp.asarray(gt))))
        ssims.append(float(losses.ssim(jnp.asarray(img), jnp.asarray(gt))))
        if lp is not None:
            lpips_vals.append(float(lp(img, gt)))
    out = dict(
        psnr=float(np.mean(psnrs)) if psnrs else float("nan"),
        ssim=float(np.mean(ssims)) if ssims else float("nan"),
        n_images=len(indices),
        per_image_psnr=psnrs,
        per_image_ssim=ssims,
    )
    if lpips_vals:
        out[lpips_key] = float(np.mean(lpips_vals))
    return out


def _weights_calibrated(weights_path: str) -> bool:
    """True iff the npz declares calibrated LPIPS heads. Legacy files
    without the flag are trusted unless their name marks them."""
    if ".uncalibrated." in os.path.basename(weights_path):
        return False
    try:
        with np.load(weights_path) as w:
            if "calibrated" in w:
                return bool(int(w["calibrated"]))
    except (OSError, ValueError):
        return False
    return True


def write_metrics_json(path: str, scene_name: str, results: dict) -> None:
    """Same shape as the reference's ./output/metrics JSON
    (metrics.py:399-417)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {scene_name: results}
    if os.path.exists(path):
        with open(path) as f:
            try:
                payload = {**json.load(f), **payload}
            except json.JSONDecodeError:
                pass
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


# ---------------------------------------------------------------- LPIPS ----
# VGG16-based LPIPS. Weights layout (npz): conv weights "features.N.weight"/
# "features.N.bias" (torchvision VGG16 indices) + linear heads "lin{k}" of
# shape (C_k,). Implemented in pure JAX; only active when weights exist.

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
_SLICE_ENDS = (3, 8, 15, 22, 29)  # relu1_2 ... relu5_3 torchvision indices
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def make_lpips(weights_path: str):
    if not os.path.exists(weights_path):
        return None
    w = dict(np.load(weights_path))

    import jax

    def vgg_features(x):
        feats = []
        h = x
        idx = 0
        for c in _VGG_CFG:
            if c == "M":
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
                idx += 1
            else:
                kw = jnp.asarray(w[f"features.{idx}.weight"])  # (O, I, 3, 3)
                kb = jnp.asarray(w[f"features.{idx}.bias"])
                h = jax.lax.conv_general_dilated(
                    h,
                    kw.transpose(2, 3, 1, 0),
                    (1, 1),
                    "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                h = jax.nn.relu(h + kb)
                idx += 2
                if idx - 1 in _SLICE_ENDS:
                    feats.append(h)
        return feats

    def lpips(img, gt):
        def prep(a):
            a = jnp.asarray(a, jnp.float32)[None] * 2.0 - 1.0
            return (a - _SHIFT) / _SCALE

        f1 = vgg_features(prep(img))
        f2 = vgg_features(prep(gt))
        total = 0.0
        for k, (a, b) in enumerate(zip(f1, f2)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            lin = jnp.asarray(w[f"lin{k}"]).reshape(1, 1, 1, -1)
            total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
        return total

    return lpips
