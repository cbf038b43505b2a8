"""Microbenchmarks of the XLA primitives dominating the render path on TPU:
sorts, gathers, scatter-adds at binning scale. Grounds optimization choices."""

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
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    g = np.random.default_rng(0)
    N = 1_000_000
    D = 4_000_000

    keys32 = jnp.asarray(g.integers(0, 2**31, D, dtype=np.int32))
    depth = jnp.asarray(g.uniform(0.2, 8.0, D).astype(np.float32))
    tile = jnp.asarray(g.integers(0, 1024, D, dtype=np.int32))
    payload = jnp.asarray(g.integers(0, N, D, dtype=np.int32))
    gid = jnp.asarray(g.integers(0, N, D, dtype=np.int32))
    gid_sorted = jnp.sort(gid)
    x8 = jnp.asarray(g.normal(size=(N, 8)).astype(np.float32))
    x16T = jnp.asarray(g.normal(size=(16, N)).astype(np.float32))
    vals16 = jnp.asarray(g.normal(size=(16, D)).astype(np.float32))
    vals8 = jnp.asarray(g.normal(size=(D, 8)).astype(np.float32))
    offs = jnp.sort(jnp.asarray(g.integers(0, D, N, dtype=np.int32)))

    t = timeit(lambda k: jax.lax.sort((k,), dimension=0, is_stable=False), keys32)
    print(f"sort 4M int32 1key unstable:        {t*1e3:8.2f} ms")
    t = timeit(lambda k, p: jax.lax.sort((k, p), dimension=0, num_keys=1, is_stable=True), keys32, payload)
    print(f"sort 4M int32 1key+1payload stable: {t*1e3:8.2f} ms")
    t = timeit(
        lambda a, b, p: jax.lax.sort((a, b, p), dimension=0, num_keys=2, is_stable=True),
        tile, depth, payload,
    )
    print(f"sort 4M 2key+payload stable:        {t*1e3:8.2f} ms")
    t = timeit(lambda k, p: jax.lax.sort((k, p), dimension=0, num_keys=1, is_stable=True),
               jnp.asarray(g.normal(size=N).astype(np.float32)),
               jnp.asarray(g.integers(0, N, N, dtype=np.int32)))
    print(f"sort 1M f32+payload stable:         {t*1e3:8.2f} ms")

    t = timeit(lambda o: jnp.searchsorted(o, jnp.arange(D, dtype=jnp.int32), side="right", method="sort"), offs)
    print(f"searchsorted sort 1M/4Mq:           {t*1e3:8.2f} ms")
    t = timeit(lambda o: jnp.searchsorted(o, jnp.arange(D, dtype=jnp.int32), side="right", method="scan_unrolled"), offs)
    print(f"searchsorted scan_unrolled:         {t*1e3:8.2f} ms")

    t = timeit(lambda x, i: x[i], x8, gid)
    print(f"gather (1M,8)[4M] rows:             {t*1e3:8.2f} ms")
    t = timeit(lambda x, i: x[:, i], x16T, gid)
    print(f"gather (16,1M)[:,4M] cols:          {t*1e3:8.2f} ms")
    t = timeit(lambda x, i: jnp.take(x, i, axis=0, indices_are_sorted=False), x8, gid)
    print(f"take (1M,8)[4M]:                    {t*1e3:8.2f} ms")
    x128 = jnp.asarray(g.normal(size=(N // 8, 128)).astype(np.float32))
    gid_small = gid % (N // 8)
    t = timeit(lambda x, i: x[i], x128, gid_small)
    print(f"gather (125k,128)[4M] rows:         {t*1e3:8.2f} ms")

    t = timeit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=N), vals8, gid)
    print(f"segment_sum 4Mx8 -> 1M (unsorted):  {t*1e3:8.2f} ms")
    t = timeit(
        lambda v, i: jax.ops.segment_sum(v, i, num_segments=N, indices_are_sorted=True),
        vals8, gid_sorted,
    )
    print(f"segment_sum 4Mx8 -> 1M (sorted):    {t*1e3:8.2f} ms")
    t = timeit(lambda v, i: jnp.zeros((N, 8), jnp.float32).at[i].add(v), vals8, gid)
    print(f"at[].add 4Mx8 -> 1M:                {t*1e3:8.2f} ms")

    # cumsum alternatives for windowed reduction
    t = timeit(lambda v: jnp.cumsum(v, axis=1), vals16)
    print(f"cumsum (16,4M) axis1:               {t*1e3:8.2f} ms")

    t = timeit(lambda c: jnp.cumsum(c), jnp.asarray(g.integers(0, 5, N, dtype=np.int32)))
    print(f"cumsum 1M int32:                    {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
