"""Per-stage timing of the production render path on real hardware.

Times preprocess / binning / re-layout+gather / pallas fwd / full fwd /
full fwd+bwd at bench.py's scale, to locate the bottleneck.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sugar_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def sync(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))


def timeit(name, fn, *args, iters=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    n = 1_000_000
    h = w = 512
    g = np.random.default_rng(0)

    from sugar_tpu.core.cameras import make_camera
    from sugar_tpu.raster import common as rc
    from sugar_tpu.raster.api import rasterize_gaussians
    from sugar_tpu.raster.binning import bin_gaussians_dense
    from sugar_tpu.raster.common import from_camera
    from sugar_tpu.raster.pallas_render import render_pallas
    from sugar_tpu.raster.preprocess import preprocess

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
    tile_cap = 16
    k_max = 8192

    args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))
    means_j, scales_j, quats_j, opac_j, colors_j = args

    prep_fn = jax.jit(
        lambda m, s, q, o, c: preprocess(m, o, settings, scales=s, quaternions=q, colors=c)
    )
    timeit("preprocess", prep_fn, means_j, scales_j, quats_j, opac_j, colors_j)
    prep = jax.block_until_ready(prep_fn(means_j, scales_j, quats_j, opac_j, colors_j))

    bin_fn = jax.jit(lambda p: bin_gaussians_dense(p, settings, tile_cap, capacity=2_560_000))
    timeit("binning (dense)", bin_fn, prep)
    binning = bin_fn(prep)
    sync(binning)
    print("num_rendered:", int(binning.num_rendered), "overflow:", int(binning.overflow))
    print("tile_count max:", int(jnp.max(binning.tile_count)),
          "mean:", float(jnp.mean(binning.tile_count)))

    fwd_fn = jax.jit(lambda p, b: render_pallas(p, b, settings, max_per_tile=k_max))
    timeit("pallas fwd (gather+kernel)", fwd_fn, prep, binning)

    full_fwd = jax.jit(
        lambda m, s, q, o, c: rasterize_gaussians(
            m, o, settings, scales=s, quaternions=q, colors=c,
            mode="pallas", tile_cap=tile_cap, dup_capacity=2_560_000, k_max=k_max,
        )["image"]
    )
    timeit("full fwd", full_fwd, *args)

    def loss_fn(m, s, q, o, c):
        out = rasterize_gaussians(
            m, o, settings, scales=s, quaternions=q, colors=c,
            mode="pallas", tile_cap=tile_cap, dup_capacity=2_560_000, k_max=k_max,
        )
        return jnp.sum(out["image"] ** 2)

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    dt = timeit("full fwd+bwd", step, *args)
    print(f"rays/s: {h * w / dt:.0f}")

    # --- isolate the pieces of the backward.
    from sugar_tpu.raster.pallas_composite import C_CHUNK, ROWS, tile_composite
    from sugar_tpu.raster.pallas_render import gather_dup, pack_params

    binning = jax.block_until_ready(bin_fn(prep))
    d = binning.sorted_gauss.shape[0]
    d_pad = ((d + C_CHUNK - 1) // C_CHUNK) * C_CHUNK + C_CHUNK
    gid = jnp.concatenate([binning.sorted_gauss, jnp.full((d_pad - d,), n, jnp.int32)])
    cnt = jnp.minimum(prep.tiles_touched, tile_cap).astype(jnp.int32)
    ok = binning.num_rendered <= d
    packed = jax.block_until_ready(
        jax.jit(pack_params)(prep.mean2d, prep.conic, prep.opacity, prep.color)
    )
    timeit(
        "gather_dup fwd",
        jax.jit(lambda p: gather_dup(p, gid, cnt, ok, n, 9, tile_cap)),
        packed,
    )
    dup_data = jax.block_until_ready(
        jnp.pad(
            gather_dup(packed, gid, cnt, ok, n, 9, tile_cap),
            ((0, ROWS - 9), (0, 0)),
        )
    )
    max_chunks = max(1, k_max // 256)
    shape_info = (settings.tiles_x, settings.tiles_x * settings.tiles_y, 3, max_chunks)
    count_clip = jnp.minimum(binning.tile_count, max_chunks * 256)

    kern_fwd = jax.jit(
        lambda dd: tile_composite(shape_info, binning.tile_start, count_clip, dd, settings.bg)[0]
    )
    timeit("kernel fwd only", kern_fwd, dup_data)
    kern_fb = jax.jit(
        jax.grad(lambda dd: jnp.sum(
            tile_composite(shape_info, binning.tile_start, count_clip, dd, settings.bg)[0] ** 2
        ))
    )
    timeit("kernel fwd+bwd only", kern_fb, dup_data)
    gd_fb = jax.jit(
        jax.grad(lambda p: jnp.sum(gather_dup(p, gid, cnt, ok, n, 9, tile_cap) ** 2))
    )
    timeit("gather_dup fwd+bwd", gd_fb, packed)


if __name__ == "__main__":
    main()
