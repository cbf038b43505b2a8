"""Benchmark: rasterizer forward+backward throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: rays/s (pixels/s) through a full differentiable render (fwd+bwd) at
1M-Gaussian scale on the production Pallas path — the BASELINE.json
headline. ``vs_baseline``: the reference repo publishes no kernel numbers
(BASELINE.md); the bar is derived from its wall-clock claim — 7k iterations
of ~0.25 Mpix fwd+bwd renders in "a few minutes" (README.md:209), taken as
3 minutes ≈ 1.0e7 rays/s on a datacenter GPU.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sugar_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main() -> None:
    n = 1_000_000
    h = w = 512  # 0.26 Mpix per render, matching the derived baseline scale
    g = np.random.default_rng(0)

    from sugar_tpu.core.cameras import make_camera
    from sugar_tpu.raster.api import rasterize_gaussians
    from sugar_tpu.raster.common import from_camera

    means = np.stack(
        [g.uniform(-1.5, 1.5, n), g.uniform(-1.5, 1.5, n), g.uniform(1.0, 8.0, n)], -1
    ).astype(np.float32)
    scales = np.exp(g.uniform(np.log(0.002), np.log(0.02), (n, 3))).astype(np.float32)
    quats = g.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = g.uniform(0.2, 0.9, n).astype(np.float32)
    colors = g.uniform(0, 1, (n, 3)).astype(np.float32)
    cam = make_camera(
        R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.2, height=h, width=w
    )
    settings = from_camera(cam)

    def loss_fn(means3d, scales_, quats_, opac_, colors_):
        out = rasterize_gaussians(
            means3d,
            opac_,
            settings,
            scales=scales_,
            quaternions=quats_,
            colors=colors_,
            mode="pallas",
            dup_capacity=2_560_000,
            tile_cap=16,
            k_max=8192,
        )
        return jnp.sum(out["image"] ** 2)

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))

    def sync(out):
        # block_until_ready does not reliably wait on the tunneled axon
        # backend; fetching a scalar does (in-order single-device queue).
        np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))

    # Warmup/compile.
    sync(step(*args))
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters

    rays_per_s = h * w / dt
    baseline = 1.0e7
    print(
        json.dumps(
            {
                "metric": "rays_per_s_fwd_bwd_1M_gaussians",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
