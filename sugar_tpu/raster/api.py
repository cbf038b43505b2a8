"""High-level differentiable rasterization API.

The TPU analog of `GaussianRasterizer.__call__`
(diff_gaussian_rasterization/__init__.py:157-220): one function wires
preprocess -> binning -> tiled compositing. Outputs mirror the reference's
(render, radii, final_T, n_contrib) plus capacity diagnostics.

Differentiable w.r.t. means3d, scales, quaternions, opacities, colors/shs and
the ``ndc_offset`` screen-space probe (whose cotangent feeds densification,
like viewspace_points.grad in gaussian_renderer/__init__.py:26-30).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from sugar_tpu.raster import common as rc
from sugar_tpu.raster.binning import bin_gaussians
from sugar_tpu.raster.preprocess import preprocess
from sugar_tpu.raster.reference_impl import render_reference
from sugar_tpu.raster.tiled import render_tiled


def resolve_mode(mode: str) -> str:
    """Resolve ``mode='auto'``: the fused Pallas production path on TPU,
    the pure-XLA tiled path elsewhere (CPU tests / debugging). Mirrors the
    reference, which always trains *through* its CUDA kernel
    (coarse_sdf.py:506) but keeps python reference paths for checking."""
    if mode == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "tiled"
    return mode


def rasterize_gaussians(
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
    mode: str = "tiled",
    dup_capacity: int | None = None,
    k_max: int = 1024,
    tile_chunk: int = 64,
    tile_cap: int | None = None,
    cap_a: int = 4,
    big_cap: int | None = None,
    debug: bool = False,
) -> dict[str, Any]:
    """Render one view. Returns dict(image (H,W,C), radii, final_T, n_contrib,
    plus overflow diagnostics for the tiled path).

    ``tile_cap`` (pallas mode): per-Gaussian cap on covered tile rects.
    When None it is derived as max(16, dup_capacity // N); a Gaussian
    touching more tiles than the cap has the excess rects dropped and
    counted in ``bin_overflow`` — check it (or use raster.adaptive) when
    rendering scenes with large near-camera splats.

    ``debug``: the analog of the CUDA rasterizer's debug flag
    (diff_gaussian_rasterization/__init__.py:83-90): after the render, a
    host callback checks every input and the output image for non-finite
    values and, on failure, writes an ``.npz`` input snapshot to
    ``$SUGAR_TPU_SNAPSHOT_DIR`` (default /tmp) for offline forwarding —
    the XLA equivalent of snapshot_fw.dump (kernels cannot crash
    mid-launch here, but poisoned inputs propagate NaNs the same way)."""
    mode = resolve_mode(mode)
    prep = preprocess(
        means3d,
        opacities,
        settings,
        scales=scales,
        quaternions=quaternions,
        cov3d=cov3d,
        colors=colors,
        shs=shs,
        alive_mask=alive_mask,
        ndc_offset=ndc_offset,
    )
    if mode == "reference":
        out = render_reference(prep, settings)
    elif mode == "tiled":
        if dup_capacity is None:
            dup_capacity = 8 * means3d.shape[0]
        binning = bin_gaussians(prep, settings, dup_capacity)
        out = render_tiled(
            prep, binning, settings, k_max=k_max, tile_chunk=tile_chunk
        )
        out["bin_overflow"] = binning.overflow
        out["num_rendered"] = binning.num_rendered
        # Uniform auto-grow diagnostics (raster.adaptive): the tiled path's
        # bin overflow is a total-duplication-capacity truncation, so it
        # doubles as cap_overflow; k_max sizing comes from max_tile_count.
        out["cap_overflow"] = binning.overflow
        out["max_tile_count"] = jnp.max(binning.tile_count)
    elif mode == "pallas":
        # Production path: fused payload-carrying binning sort with
        # exact-support tile culling (raster/fused.py), then the Pallas
        # compositing kernel. Lazy import for CPU-only users.
        from sugar_tpu.raster.fused import render_fused

        if dup_capacity is None:
            dup_capacity = 8 * means3d.shape[0]
        if tile_cap is None:
            # Per-Gaussian tile-rect capacity; derived from the legacy
            # total-duplication capacity when not given explicitly, floored
            # at 16 so large near-camera splats are not silently clipped
            # when dup_capacity/N is small (overflow is still counted in
            # bin_overflow; callers wanting a tighter clip pass tile_cap
            # explicitly).
            tile_cap = max(16, dup_capacity // means3d.shape[0])
        out = render_fused(
            prep, settings, tile_cap=tile_cap, capacity=dup_capacity,
            max_per_tile=k_max, cap_a=cap_a, big_cap=big_cap,
        )
    elif mode == "pallas_twopass":
        # Previous two-pass layout (dense binning + gather_dup); kept for
        # cross-checks and as the basis of the sharded path's per-band
        # compositing (parallel/render.py).
        from sugar_tpu.raster.binning import bin_gaussians_dense
        from sugar_tpu.raster.pallas_render import render_pallas

        if dup_capacity is None:
            dup_capacity = 8 * means3d.shape[0]
        if tile_cap is None:
            tile_cap = max(16, dup_capacity // means3d.shape[0])
        binning = bin_gaussians_dense(prep, settings, tile_cap, capacity=dup_capacity)
        out = render_pallas(
            prep, binning, settings, max_per_tile=k_max, seg_cap=tile_cap
        )
        out["bin_overflow"] = binning.overflow
        out["num_rendered"] = binning.num_rendered
        # Sizing diagnostics for the auto-grow protocol (raster.adaptive).
        d = binning.sorted_gauss.shape[0]
        out["cap_overflow"] = jnp.maximum(binning.num_rendered - d, 0)
        out["max_tiles_touched"] = jnp.max(prep.tiles_touched)
    else:
        raise ValueError(f"unknown mode: {mode}")
    out["radii"] = prep.radius
    if debug:
        jax.debug.callback(
            _debug_snapshot,
            dict(
                means3d=means3d, opacities=opacities, scales=scales,
                quaternions=quaternions, colors=colors, shs=shs,
                image=out["image"],
            ),
        )
    return out


def _debug_snapshot(arrays: dict) -> None:
    """Host-side finiteness check + input snapshot dump (debug=True)."""
    import os
    import time

    import numpy as np

    bad = [
        k for k, v in arrays.items()
        if v is not None and not np.isfinite(np.asarray(v)).all()
    ]
    if not bad:
        return
    out_dir = os.environ.get("SUGAR_TPU_SNAPSHOT_DIR", "/tmp")
    path = os.path.join(out_dir, f"sugar_tpu_snapshot_{int(time.time())}.npz")
    np.savez_compressed(
        path, **{k: np.asarray(v) for k, v in arrays.items() if v is not None}
    )
    print(
        f"[sugar_tpu debug] non-finite values in {bad}; "
        f"input snapshot written to {path} (forward it in a bug report, "
        f"as with the CUDA rasterizer's snapshot_fw.dump)"
    )
