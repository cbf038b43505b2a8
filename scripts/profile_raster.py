"""Stage-by-stage timing of the production Pallas render path at bench scale.

Isolates: preprocess, binning (dup sort), aligned re-layout + pre-gather,
Pallas forward, full fwd, full fwd+bwd — to find the rays/s bottleneck.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/sugar_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def _sync(out):
    # block_until_ready does not reliably wait on the tunneled axon backend;
    # fetching a scalar does (single device executes in dispatch order).
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, out


def main():
    n = 1_000_000
    h = w = 512
    g = np.random.default_rng(0)

    from sugar_tpu.core.cameras import make_camera
    from sugar_tpu.raster import common as rc
    from sugar_tpu.raster.api import rasterize_gaussians
    from sugar_tpu.raster.binning import bin_gaussians
    from sugar_tpu.raster.common import from_camera
    from sugar_tpu.raster.preprocess import preprocess

    means = np.stack(
        [g.uniform(-1.5, 1.5, n), g.uniform(-1.5, 1.5, n), g.uniform(1.0, 8.0, n)], -1
    ).astype(np.float32)
    scales = np.exp(g.uniform(np.log(0.002), np.log(0.02), (n, 3))).astype(np.float32)
    quats = g.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = g.uniform(0.2, 0.9, n).astype(np.float32)
    colors = g.uniform(0, 1, (n, 3)).astype(np.float32)
    cam = make_camera(R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.2, height=h, width=w)
    settings = from_camera(cam)
    dup_capacity = 4 * n
    k_max = 8192

    args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))

    # 1. preprocess only
    @jax.jit
    def f_prep(m, s, q, o, c):
        p = preprocess(m, o, settings, scales=s, quaternions=q, colors=c)
        return p.mean2d, p.conic, p.depth, p.tiles_touched

    dt, _ = timeit(f_prep, *args)
    print(f"preprocess:            {dt*1e3:8.2f} ms")

    # 2. preprocess + binning
    @jax.jit
    def f_bin(m, s, q, o, c):
        p = preprocess(m, o, settings, scales=s, quaternions=q, colors=c)
        b = bin_gaussians(p, settings, dup_capacity)
        return b.sorted_gauss, b.tile_start

    dt, _ = timeit(f_bin, *args)
    print(f"prep+binning:          {dt*1e3:8.2f} ms")

    # 3. + pre-gather (pack + gather_dup) but no pallas call
    from sugar_tpu.raster.binning import bucketize_by_offsets
    from sugar_tpu.raster.pallas_composite import C_CHUNK
    from sugar_tpu.raster.pallas_render import gather_dup, pack_params

    @jax.jit
    def f_gather(m, s, q, o, c):
        p = preprocess(m, o, settings, scales=s, quaternions=q, colors=c)
        b = bin_gaussians(p, settings, dup_capacity)
        num_tiles = settings.tiles_x * settings.tiles_y
        max_chunks = k_max // C_CHUNK
        count_clip = jnp.minimum(b.tile_count, max_chunks * C_CHUNK)
        aligned_counts = ((count_clip + C_CHUNK - 1) // C_CHUNK) * C_CHUNK
        aligned_start = jnp.cumsum(aligned_counts) - aligned_counts
        d_al = dup_capacity + C_CHUNK * num_tiles
        sl = jnp.arange(d_al, dtype=jnp.int32)
        t = jnp.clip(bucketize_by_offsets(aligned_start, d_al), 0, num_tiles - 1)
        local = sl - aligned_start[t]
        total_aligned = aligned_start[-1] + aligned_counts[-1]
        valid = (local < count_clip[t]) & (sl < total_aligned)
        src_slot = jnp.clip(b.tile_start[t] + local, 0, dup_capacity - 1)
        gid = jnp.where(valid, b.sorted_gauss[src_slot], n)
        packed = pack_params(p.mean2d, p.conic, p.opacity, p.color)
        return gather_dup(packed, gid, n)

    dt, _ = timeit(f_gather, *args)
    print(f"prep+bin+gather:       {dt*1e3:8.2f} ms")

    # 4. full forward pallas
    @jax.jit
    def f_fwd(m, s, q, o, c):
        out = rasterize_gaussians(
            m, o, settings, scales=s, quaternions=q, colors=c,
            mode="pallas", dup_capacity=dup_capacity, k_max=k_max,
        )
        return out["image"]

    dt, img = timeit(f_fwd, *args)
    print(f"full forward:          {dt*1e3:8.2f} ms")

    # 5. fwd+bwd
    @jax.jit
    def f_fb(m, s, q, o, c):
        def loss(m, s, q, o, c):
            out = rasterize_gaussians(
                m, o, settings, scales=s, quaternions=q, colors=c,
                mode="pallas", dup_capacity=dup_capacity, k_max=k_max,
            )
            return jnp.sum(out["image"] * 0.5) + jnp.sum(out["final_T"]) * 0.1
        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(m, s, q, o, c)
        return l, grads

    dt, _ = timeit(f_fb, *args)
    print(f"full fwd+bwd:          {dt*1e3:8.2f} ms   -> {h*w/dt:,.0f} rays/s")


if __name__ == "__main__":
    main()
