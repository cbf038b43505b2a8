"""Per-Gaussian preprocessing: projection, EWA cov2D, conic, radius, tiles.

TPU-native recast of the CUDA ``preprocessCUDA`` kernel
(cuda_rasterizer/forward.cu:160-258): instead of one thread per Gaussian, the
whole stage is a vectorized pure-JAX function over the (N, ...) parameter
arrays — XLA fuses it into a handful of VPU loops; no Pallas needed here.

Dead/culled Gaussians are signalled by ``tiles_touched == 0`` (matching the
CUDA early-exit protocol) rather than by compaction, keeping shapes static.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sugar_tpu.core import sh as sh_lib
from sugar_tpu.raster import common as rc


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Preprocessed:
    """Per-Gaussian screen-space quantities (all shape (N, ...))."""

    mean2d: jnp.ndarray  # (N, 2) pixel coords (ndc2Pix convention)
    depth: jnp.ndarray  # (N,) view-space z
    conic: jnp.ndarray  # (N, 3) inverse cov2D (a, b, c)
    opacity: jnp.ndarray  # (N,)
    color: jnp.ndarray  # (N, C) features to composite
    radius: jnp.ndarray  # (N,) int32 pixel radius (0 = culled)
    rect_min: jnp.ndarray  # (N, 2) int32 tile rect (x, y), inclusive
    rect_max: jnp.ndarray  # (N, 2) int32 tile rect (x, y), exclusive
    tiles_touched: jnp.ndarray  # (N,) int32


def _cov3d_channels(
    scales: jnp.ndarray, quaternions: jnp.ndarray, scale_modifier: float = 1.0
) -> tuple:
    """(N,3) scales + (N,4) unit quats -> 6 (N,) covariance channels
    (c00, c01, c02, c11, c12, c22).

    Sigma = R diag(s^2) R^T (forward.cu:118-152; quats are assumed already
    normalized, as the model activations guarantee).

    TPU note: pure structure-of-arrays elementwise math on (N,) channels,
    with NO (N,3,3) materialization anywhere — a batched einsum lowers to
    1M tiny padded MXU matmuls (~90 ms at N=1M) and even stacking to
    (N,3,3) and re-slicing costs multiple 36 MB HBM round-trips that XLA
    does not always elide.
    """
    w, x, y, z = (quaternions[..., i] for i in range(4))
    # Rotation matrix channels (3DGS build_rotation layout), never stacked.
    r = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]
    s2 = (scale_modifier * scales) ** 2  # (N, 3)
    s0, s1, s2_ = s2[..., 0], s2[..., 1], s2[..., 2]

    def sig(i, k):
        return r[i][0] * s0 * r[k][0] + r[i][1] * s1 * r[k][1] + r[i][2] * s2_ * r[k][2]

    return sig(0, 0), sig(0, 1), sig(0, 2), sig(1, 1), sig(1, 2), sig(2, 2)


def compute_cov3d(
    scales: jnp.ndarray, quaternions: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """(N,3) scales + (N,4) unit quats -> (N,3,3) world covariance.

    Public (N,3,3) form for API parity with the CUDA precomputed-cov3d
    input; the internal hot path uses ``_cov3d_channels`` directly.
    """
    c00, c01, c02, c11, c12, c22 = _cov3d_channels(
        scales, quaternions, scale_modifier
    )
    row0 = jnp.stack([c00, c01, c02], axis=-1)
    row1 = jnp.stack([c01, c11, c12], axis=-1)
    row2 = jnp.stack([c02, c12, c22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def compute_cov2d(
    means3d: jnp.ndarray,
    cov3d,
    viewmatrix: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tanfovx: float,
    tanfovy: float,
) -> jnp.ndarray:
    """EWA projection of 3D covariance to 2D screen space (forward.cu:74-113).

    ``cov3d`` is either an (N,3,3) matrix array or a 6-tuple of (N,)
    channels (c00, c01, c02, c11, c12, c22). Returns (N, 3) packed
    (cov_xx, cov_xy, cov_yy) with the +0.3 low-pass already added to the
    diagonal.
    """
    W = viewmatrix[:3, :3]
    t = means3d @ W.T + viewmatrix[:3, 3]
    # Guard: culled (z <= Z_CULL) Gaussians never contribute, but a 1/z at
    # z ~ 0 would poison gradients with NaNs even under jnp.where masking —
    # substitute a safe depth for them before any division.
    tz = jnp.where(t[..., 2] > rc.Z_CULL, t[..., 2], 1.0)
    limx = rc.FOV_CLAMP * tanfovx
    limy = rc.FOV_CLAMP * tanfovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows: d(pix)/d(cam xyz), third row dropped (forward.cu:89-93).
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2

    # M = J @ W (2x3), cov2d = M @ cov3d @ M^T (2x2 symmetric). Expanded to
    # structure-of-arrays elementwise channels: batched (N,2,3)x(N,3,3)
    # einsums lower to tiny padded MXU matmuls (profiled ~90 ms at N=1M).
    # M row0 = j00*W[0] + j02*W[2]; row1 = j11*W[1] + j12*W[2].
    m0 = [j00 * W[0, k] + j02 * W[2, k] for k in range(3)]  # 3 x (N,)
    m1 = [j11 * W[1, k] + j12 * W[2, k] for k in range(3)]
    if isinstance(cov3d, tuple):
        s00, s01, s02, s11, s12, s22 = cov3d
    else:
        s = cov3d  # (N, 3, 3) symmetric
        s00, s01, s02 = s[..., 0, 0], s[..., 0, 1], s[..., 0, 2]
        s11, s12, s22 = s[..., 1, 1], s[..., 1, 2], s[..., 2, 2]

    def quad(a, b):
        # a^T Sigma b for 3-channel lists a, b.
        return (
            a[0] * (s00 * b[0] + s01 * b[1] + s02 * b[2])
            + a[1] * (s01 * b[0] + s11 * b[1] + s12 * b[2])
            + a[2] * (s02 * b[0] + s12 * b[1] + s22 * b[2])
        )

    cxx = quad(m0, m0) + rc.LOWPASS
    cyy = quad(m1, m1) + rc.LOWPASS
    cxy = quad(m0, m1)
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def preprocess(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    settings: rc.RasterSettings,
    scales: jnp.ndarray | None = None,
    quaternions: jnp.ndarray | None = None,
    cov3d: jnp.ndarray | None = None,
    colors: jnp.ndarray | None = None,
    shs: jnp.ndarray | None = None,
    alive_mask: jnp.ndarray | None = None,
    ndc_offset: jnp.ndarray | None = None,
) -> Preprocessed:
    """Vectorized preprocess for all N Gaussians.

    Either (scales, quaternions) or precomputed ``cov3d`` must be given;
    either ``colors`` (N, C) or ``shs`` (N, C, K) must be given. An optional
    ``alive_mask`` force-culls padded/dead slots (static-shape densification).
    """
    n = means3d.shape[0]
    if cov3d is None:
        cov3d = _cov3d_channels(scales, quaternions, settings.scale_modifier)
    if colors is None:
        dirs = means3d - settings.campos
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        colors = sh_lib.sh_to_rgb(settings.sh_degree, shs, dirs)

    # Projection (forward.cu:197-200).
    depth = means3d @ settings.viewmatrix[2, :3] + settings.viewmatrix[2, 3]
    in_front = depth > rc.Z_CULL
    P = settings.projmatrix
    p_hom = means3d @ P[:, :3].T + P[:, 3]
    # NaN-grad guard for near-zero homogeneous w of culled Gaussians.
    w_safe = jnp.where(in_front, p_hom[..., 3] + rc.W_EPS, 1.0)
    p_w = 1.0 / w_safe
    ndc = p_hom[..., :2] * p_w[..., None]
    if ndc_offset is not None:
        # Zero in value; its cotangent is the NDC-space screen gradient the
        # densifier consumes (CUDA dL_dmean2D units, backward.cu:399-410).
        ndc = ndc + ndc_offset

    mean2d = jnp.stack(
        [
            ((ndc[..., 0] + 1.0) * settings.image_width - 1.0) * 0.5,
            ((ndc[..., 1] + 1.0) * settings.image_height - 1.0) * 0.5,
        ],
        axis=-1,
    )

    cov2d = compute_cov2d(
        means3d,
        cov3d,
        settings.viewmatrix,
        settings.focal_x,
        settings.focal_y,
        settings.tanfovx,
        settings.tanfovy,
    )
    cxx, cxy, cyy = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = cxx * cyy - cxy * cxy
    det_valid = det != 0.0
    det_safe = jnp.where(det_valid, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=-1)

    # Radius from eigenvalues (forward.cu:227-232).
    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam_max = mid + disc
    radius_f = jnp.ceil(rc.RADIUS_SIGMA * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    # Tile rect (auxiliary.h:46-56). int cast truncates toward zero as CUDA.
    gx, gy = settings.tiles_x, settings.tiles_y
    rmin_x = jnp.clip(
        ((mean2d[..., 0] - radius_f) / rc.TILE_X).astype(jnp.int32), 0, gx
    )
    rmin_y = jnp.clip(
        ((mean2d[..., 1] - radius_f) / rc.TILE_Y).astype(jnp.int32), 0, gy
    )
    rmax_x = jnp.clip(
        ((mean2d[..., 0] + radius_f + rc.TILE_X - 1) / rc.TILE_X).astype(jnp.int32),
        0,
        gx,
    )
    rmax_y = jnp.clip(
        ((mean2d[..., 1] + radius_f + rc.TILE_Y - 1) / rc.TILE_Y).astype(jnp.int32),
        0,
        gy,
    )

    alive = depth > rc.Z_CULL
    alive &= det_valid
    if alive_mask is not None:
        alive &= alive_mask
    tiles = (rmax_x - rmin_x) * (rmax_y - rmin_y)
    tiles = jnp.where(alive, tiles, 0)
    radius = jnp.where(tiles > 0, radius_f, 0.0).astype(jnp.int32)

    return Preprocessed(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        opacity=opacities.reshape(n),
        color=colors,
        radius=radius,
        rect_min=jnp.stack([rmin_x, rmin_y], axis=-1),
        rect_max=jnp.stack([rmax_x, rmax_y], axis=-1),
        tiles_touched=tiles,
    )
