"""Slow numpy oracle rasterizer for parity tests.

A deliberately naive, loop-based transcription of the CUDA pipeline's
*semantics* (cuda_rasterizer/forward.cu + auxiliary.h, see SURVEY.md §2.7):
per-Gaussian preprocess, per-tile depth-ordered alpha compositing with the
0.99 clamp, 1/255 cutoff and 1e-4 early stop. Written independently from the
JAX implementation so the two can cross-validate.
"""

from __future__ import annotations

import math

import numpy as np

TILE = 16


def oracle_render(
    means3d,
    scales,
    quats,
    opacities,
    colors,
    viewmatrix,
    projmatrix,
    width,
    height,
    tanfovx,
    tanfovy,
    bg,
    scale_modifier=1.0,
):
    n = means3d.shape[0]
    focal_x = width / (2 * tanfovx)
    focal_y = height / (2 * tanfovy)
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE

    mean2d = np.zeros((n, 2))
    depth = np.zeros(n)
    conic = np.zeros((n, 3))
    rect = np.zeros((n, 4), np.int64)
    radius = np.zeros(n)
    alive = np.zeros(n, bool)

    for i in range(n):
        p = means3d[i]
        p_view = viewmatrix[:3, :3] @ p + viewmatrix[:3, 3]
        if p_view[2] <= 0.2:
            continue
        h = projmatrix[:, :3] @ p + projmatrix[:, 3]
        pw = 1.0 / (h[3] + 1e-7)
        ndc = h[:3] * pw
        pix = np.array(
            [((ndc[0] + 1) * width - 1) * 0.5, ((ndc[1] + 1) * height - 1) * 0.5]
        )
        # cov3d
        w_, x_, y_, z_ = quats[i] / np.linalg.norm(quats[i])
        R = np.array(
            [
                [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - w_ * z_), 2 * (x_ * z_ + w_ * y_)],
                [2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_ * x_ + z_ * z_), 2 * (y_ * z_ - w_ * x_)],
                [2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_), 1 - 2 * (x_ * x_ + y_ * y_)],
            ]
        )
        S = np.diag((scale_modifier * scales[i]) ** 2)
        cov3 = R @ S @ R.T
        # EWA
        t = p_view.copy()
        limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
        t[0] = np.clip(t[0] / t[2], -limx, limx) * t[2]
        t[1] = np.clip(t[1] / t[2], -limy, limy) * t[2]
        J = np.array(
            [
                [focal_x / t[2], 0, -focal_x * t[0] / t[2] ** 2],
                [0, focal_y / t[2], -focal_y * t[1] / t[2] ** 2],
            ]
        )
        M = J @ viewmatrix[:3, :3]
        cov2 = M @ cov3 @ M.T
        cov2[0, 0] += 0.3
        cov2[1, 1] += 0.3
        det = cov2[0, 0] * cov2[1, 1] - cov2[0, 1] ** 2
        if det == 0:
            continue
        con = np.array([cov2[1, 1], -cov2[0, 1], cov2[0, 0]]) / det
        mid = 0.5 * (cov2[0, 0] + cov2[1, 1])
        lam1 = mid + math.sqrt(max(0.1, mid * mid - det))
        r = math.ceil(3.0 * math.sqrt(max(lam1, 0.0)))
        rmin_x = min(gx, max(0, int((pix[0] - r) / TILE)))
        rmin_y = min(gy, max(0, int((pix[1] - r) / TILE)))
        rmax_x = min(gx, max(0, int((pix[0] + r + TILE - 1) / TILE)))
        rmax_y = min(gy, max(0, int((pix[1] + r + TILE - 1) / TILE)))
        if (rmax_x - rmin_x) * (rmax_y - rmin_y) == 0:
            continue
        alive[i] = True
        mean2d[i] = pix
        depth[i] = p_view[2]
        conic[i] = con
        rect[i] = (rmin_x, rmin_y, rmax_x, rmax_y)
        radius[i] = r

    c = colors.shape[-1]
    out = np.zeros((height, width, c))
    final_t = np.ones((height, width))
    order = np.argsort(depth[alive], kind="stable")
    ids = np.nonzero(alive)[0][order]

    for pyx in range(height):
        for pxx in range(width):
            tx, ty = pxx // TILE, pyx // TILE
            T = 1.0
            C = np.zeros(c)
            for i in ids:
                if not (rect[i, 0] <= tx < rect[i, 2] and rect[i, 1] <= ty < rect[i, 3]):
                    continue
                d = mean2d[i] - np.array([pxx, pyx], float)
                power = (
                    -0.5 * (conic[i, 0] * d[0] ** 2 + conic[i, 2] * d[1] ** 2)
                    - conic[i, 1] * d[0] * d[1]
                )
                if power > 0:
                    continue
                alpha = min(0.99, opacities[i] * math.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_t = T * (1 - alpha)
                if test_t < 1e-4:
                    break
                C += colors[i] * alpha * T
                T = test_t
            out[pyx, pxx] = C + T * bg
            final_t[pyx, pxx] = T
    return dict(image=out, final_T=final_t, radius=radius)
