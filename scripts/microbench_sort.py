"""Microbenchmark lax.sort / gather variants on the real TPU.

Grounds the binning + gradient-reduction design: payload count, key count,
stability, and gather row-count costs.
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


def timeit(name, fn, *args, iters=10):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    g = np.random.default_rng(0)

    for m in (16, 8):
        d = m * 1_000_000
        keys = jnp.asarray(g.integers(0, 2**30, d, dtype=np.int32))
        pay = jnp.asarray(g.integers(0, 2**30, d, dtype=np.int32))
        timeit(
            f"sort {m}M 1-array unstable",
            jax.jit(lambda k: jax.lax.sort((k,), dimension=0, num_keys=1, is_stable=False)),
            keys,
        )
        timeit(
            f"sort {m}M key+payload unstable",
            jax.jit(lambda k, p: jax.lax.sort((k, p), dimension=0, num_keys=1, is_stable=False)),
            keys, pay,
        )
        timeit(
            f"sort {m}M key+payload stable",
            jax.jit(lambda k, p: jax.lax.sort((k, p), dimension=0, num_keys=1, is_stable=True)),
            keys, pay,
        )

    d = 2_560_000
    n = 1_000_000
    keys = jnp.asarray(g.integers(0, n, d, dtype=np.int32))
    pay = jnp.asarray(g.integers(0, d, d, dtype=np.int32))
    timeit(
        "sort 2.56M key+payload unstable",
        jax.jit(lambda k, p: jax.lax.sort((k, p), dimension=0, num_keys=1, is_stable=False)),
        keys, pay,
    )
    rows9 = jnp.asarray(g.normal(size=(9, d)).astype(np.float32))
    perm = jnp.asarray(g.permutation(d).astype(np.int32))
    timeit("gather (9, 2.56M) by perm", jax.jit(lambda r, p: r[:, p]), rows9, perm)
    rows16 = jnp.asarray(g.normal(size=(16, d)).astype(np.float32))
    timeit("gather (16, 2.56M) by perm", jax.jit(lambda r, p: r[:, p]), rows16, perm)
    rows1 = rows9[0]
    timeit("gather (1, 2.56M) by perm", jax.jit(lambda r, p: r[p]), rows1, perm)
    # transpose layout: gather rows of (D, 9) by perm
    cols9 = jnp.asarray(np.ascontiguousarray(np.asarray(rows9).T))
    timeit("gather (2.56M, 9) rows by perm", jax.jit(lambda r, p: r[p, :]), cols9, perm)
    cols16 = jnp.asarray(np.ascontiguousarray(np.asarray(rows16).T))
    timeit("gather (2.56M, 16) rows by perm", jax.jit(lambda r, p: r[p, :]), cols16, perm)
    # searchsorted method=sort at segment-start scale
    q = jnp.arange(n + 1, dtype=jnp.int32)
    skeys = jnp.sort(keys)
    timeit(
        "searchsorted 2.56M keys / 1M q (sort)",
        jax.jit(lambda k, qq: jnp.searchsorted(k, qq, side="left", method="sort")),
        skeys, q,
    )
    # int32 bitpacked gather: 5 rows instead of 9
    rows5 = jnp.asarray(g.integers(0, 2**30, (5, d), dtype=np.int32))
    timeit("gather (5, 2.56M) int32 by perm", jax.jit(lambda r, p: r[:, p]), rows5, perm)




def extra():
    g = np.random.default_rng(0)
    d = 2_560_000
    n = 1_000_000
    gid = jnp.asarray(np.sort(g.integers(0, n, d)).astype(np.int32))  # ascending
    perm_rand = jnp.asarray(g.permutation(d).astype(np.int32))
    rows9 = jnp.asarray(g.normal(size=(9, d)).astype(np.float32))
    timeit("gather (9,D) ascending idx", jax.jit(lambda r, p: r[:, p]), rows9,
           jnp.asarray(np.arange(d, dtype=np.int32)))
    timeit("gather (9,D) sorted-val idx", jax.jit(lambda r, p: r[:, p]), rows9,
           jnp.asarray(np.sort(g.integers(0, d, d)).astype(np.int32)))
    timeit("gather (9,D) random idx", jax.jit(lambda r, p: r[:, p]), rows9, perm_rand)
    keys = jnp.asarray(g.integers(0, n, d, dtype=np.int32))

    def sort_payload(k, r):
        ops = jax.lax.sort((k,) + tuple(r), dimension=0, num_keys=1, is_stable=False)
        return ops[1]

    timeit("sort key + 9 f32 payload 2.56M",
           jax.jit(lambda k, r: sort_payload(k, list(r))), keys, rows9)
    rows4 = rows9[:4]
    timeit("sort key + 4 f32 payload 2.56M",
           jax.jit(lambda k, r: sort_payload(k, list(r))), keys, rows4)
    # fused: sort (gid, slot) then gather, at realistic semi-structured perm
    slot = jnp.arange(d, dtype=jnp.int32)
    def sort_then_gather(k, r):
        ks, pm = jax.lax.sort((k, slot), dimension=0, num_keys=1, is_stable=False)
        return r[:, pm]
    timeit("sort pair + gather (9,D) real perm",
           jax.jit(sort_then_gather), keys, rows9)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "extra":
        extra()
        sys.exit(0)
    main()
