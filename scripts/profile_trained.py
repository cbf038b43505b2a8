import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Per-stage timing of the production render path on the TRAINED-STATS
scene (bench.py _scene_trained): surface-concentrated, opacity ~0.95,
k_max 28672 — the scene that resembles a production checkpoint. Locates
where the extra wall-time vs the random scene goes (VERDICT r4 #3).

Usage: python scripts/profile_trained.py [--scene random|trained]
"""

import argparse
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
    print(f"{name:40s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="trained", choices=["trained", "random"])
    args = ap.parse_args()

    import bench as bench_mod
    from sugar_tpu.core.cameras import make_camera
    from sugar_tpu.raster.common import from_camera
    from sugar_tpu.raster.fused import bin_fused, render_fused
    from sugar_tpu.raster.pallas_composite import C_CHUNK, tile_composite
    from sugar_tpu.raster.pallas_render import gather_dup, pack_params
    from sugar_tpu.raster.preprocess import preprocess

    n = 1_000_000
    h = w = 512
    if args.scene == "trained":
        arrays = bench_mod._scene_trained(n, np.random.default_rng(1))
        dup_capacity, k_max = 1_900_000, 24832
    else:
        arrays = bench_mod._scene_random(n, np.random.default_rng(0))
        dup_capacity, k_max = 1_900_000, 10240
    means, scales, quats, opac, colors = (jnp.asarray(x) for x in arrays)
    cam = make_camera(
        R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.2, height=h, width=w
    )
    settings = from_camera(cam)
    tile_cap = 16
    cap_a = 4
    big_cap = max(n // 8, 65536)
    tx_n, ty_n = settings.tiles_x, settings.tiles_y
    num_tiles = tx_n * ty_n
    max_chunks = (k_max + C_CHUNK - 1) // C_CHUNK

    prep_fn = jax.jit(
        lambda m, s, q, o, c: preprocess(
            m, o, settings, scales=s, quaternions=q, colors=c
        )
    )
    prep = prep_fn(means, scales, quats, opac, colors)
    timeit("preprocess fwd", prep_fn, means, scales, quats, opac, colors)

    bin_fn = jax.jit(
        lambda p: bin_fused(p, num_tiles, tx_n, tile_cap, cap_a, big_cap, dup_capacity)
    )
    b = bin_fn(prep)
    timeit("bin_fused (expand+sort+ranges)", bin_fn, prep)
    nr = int(b["num_rendered"])
    mtc = int(jnp.max(b["tile_count"]))
    deep = int(jnp.sum((b["tile_count"] > 2048).astype(jnp.int32)))
    print(f"  num_rendered={nr}  max_tile_count={mtc}  tiles>2048 deep={deep}")

    def gather_fn(p, bb):
        packed = pack_params(p.mean2d, p.conic, p.opacity, p.color)
        rows_pad = 16
        packed_pad = jnp.concatenate(
            [packed, jnp.zeros((rows_pad - 9, n), jnp.float32)], axis=0
        )
        return gather_dup(
            packed_pad, bb["gid"], bb["counts_culled"], bb["inexact"] == 0,
            n, 9, tile_cap,
        )

    gather_j = jax.jit(gather_fn)
    dup = gather_j(prep, b)
    timeit("pack + gather_dup", gather_j, prep, b)

    comp_fn = jax.jit(
        lambda bb, dd: tile_composite(
            (tx_n, num_tiles, 3, max_chunks), bb["tile_start"],
            jnp.minimum(bb["tile_count"], max_chunks * C_CHUNK), dd,
            settings.bg,
        )
    )
    out_c = comp_fn(b, dup)
    timeit("tile_composite fwd (kernel)", comp_fn, b, dup)
    nch = None

    full_fn = jax.jit(
        lambda m, s, q, o, c: render_fused(
            preprocess(m, o, settings, scales=s, quaternions=q, colors=c),
            settings, tile_cap=tile_cap, capacity=dup_capacity,
            max_per_tile=k_max,
        )["image"]
    )
    timeit("full forward", full_fn, means, scales, quats, opac, colors)

    def loss_fn(m, s, q, o, c):
        img = render_fused(
            preprocess(m, o, settings, scales=s, quaternions=q, colors=c),
            settings, tile_cap=tile_cap, capacity=dup_capacity,
            max_per_tile=k_max,
        )["image"]
        return jnp.sum(img**2)

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    timeit("full fwd+bwd", grad_fn, means, scales, quats, opac, colors)

    # Kernel-only fwd+bwd (isolates the compositor + its VJP incl. the
    # gather_dup backward segment reduction).
    def kloss(dd):
        img, t, _ = tile_composite(
            (tx_n, num_tiles, 3, max_chunks), b["tile_start"],
            jnp.minimum(b["tile_count"], max_chunks * C_CHUNK), dd, settings.bg,
        )
        return jnp.sum(img**2) + jnp.sum(t)

    kgrad = jax.jit(jax.grad(kloss))
    timeit("kernel fwd+bwd (d dup_data)", kgrad, dup)

    # Processed-chunk statistics from the forward (early-exit effectiveness).
    img, t_fin, ncontrib = out_c
    print(f"  mean n_contrib={float(jnp.mean(ncontrib)):.1f}  "
          f"mean final_T={float(jnp.mean(t_fin)):.4f}")


if __name__ == "__main__":
    main()
