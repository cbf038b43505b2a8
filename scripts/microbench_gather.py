"""Microbench: dup-gather layout alternatives at bench scale.

Grounds the round-3 rasterizer optimization: which layout moves the
(9-row, 2.2M-slot) dup view fastest on TPU — column gather on (ROWS, N),
row gather on (N, ROWS), sort-carried payload — and what the 16M binning
sort costs with/without a payload array.
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
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(name, fn, *args, iters=5, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    g = np.random.default_rng(0)
    N = 1_000_000
    D = 2_230_000  # ~num_rendered at bench scale
    E = 16_000_000  # dense expansion N * tile_cap

    gid = jnp.asarray(g.integers(0, N, D, dtype=np.int32))
    packed_cm = jnp.asarray(g.normal(size=(9, N)).astype(np.float32))
    packed_rm16 = jnp.asarray(g.normal(size=(N, 16)).astype(np.float32))
    packed_rm8 = jnp.asarray(g.normal(size=(N, 8)).astype(np.float32))
    ct = jnp.asarray(g.normal(size=(9, D)).astype(np.float32))
    ct_rm = jnp.asarray(g.normal(size=(D, 16)).astype(np.float32))

    # --- forward gather layouts
    timeit("col gather (9,N)[:,gid] -> (9,D)", lambda p, i: p[:, i], packed_cm, gid)
    timeit("row gather (N,16)[gid] -> (D,16)", lambda p, i: p[i, :], packed_rm16, gid)
    timeit("row gather (N,8)[gid] -> (D,8)", lambda p, i: p[i, :], packed_rm8, gid)
    timeit(
        "row gather (N,16) + transpose -> (16,D)",
        lambda p, i: p[i, :].T,
        packed_rm16,
        gid,
    )

    # --- backward: sort-by-gid + gather vs sort carrying payload
    slot = jnp.arange(D, dtype=jnp.int32)

    def sort_then_gather(c, i):
        gs, perm = jax.lax.sort((i, slot), dimension=0, num_keys=1, is_stable=False)
        return gs, c[:, perm]

    timeit("bwd: sort(gid,slot) + col gather ct", sort_then_gather, ct, gid)

    def sort_then_rowgather(c, i):
        gs, perm = jax.lax.sort((i, slot), dimension=0, num_keys=1, is_stable=False)
        return gs, c[perm, :]

    timeit("bwd: sort(gid,slot) + row gather ct_rm", sort_then_rowgather, ct_rm, gid)

    def sort_payload(c, i):
        args = (i,) + tuple(c[k] for k in range(9))
        out = jax.lax.sort(args, dimension=0, num_keys=1, is_stable=False)
        return out[1]

    timeit("bwd: sort gid + 9 f32 payloads", sort_payload, ct, gid)

    # --- binning sort variants at expansion scale
    key_e = jnp.asarray(g.integers(0, 2**30, E, dtype=np.int32))
    pay_e = jnp.asarray(g.integers(0, N, E, dtype=np.int32))
    timeit(
        "16M sort key+payload",
        lambda k, p: jax.lax.sort((k, p), dimension=0, num_keys=1, is_stable=False),
        key_e,
        pay_e,
        iters=3,
    )
    timeit(
        "16M sort key only",
        lambda k: jax.lax.sort((k,), dimension=0, num_keys=1, is_stable=False),
        key_e,
        iters=3,
    )
    def sort_trunc_gather(k, gs):
        (sk,) = jax.lax.sort((k,), dimension=0, num_keys=1, is_stable=False)
        rank = sk[:D] & ((1 << 20) - 1)
        return sk[:D] >> 20, gs[rank]

    timeit(
        "16M sort key only + gather gid at D",
        sort_trunc_gather,
        key_e,
        jnp.asarray(g.integers(0, N, N, dtype=np.int32)),
        iters=3,
    )
    # 8M variant (tile_cap 8)
    key_e8 = key_e[:8_000_000]
    pay_e8 = pay_e[:8_000_000]
    timeit(
        "8M sort key+payload",
        lambda k, p: jax.lax.sort((k, p), dimension=0, num_keys=1, is_stable=False),
        key_e8,
        pay_e8,
        iters=3,
    )

    # --- 1D gather at D scale (rank -> gid map)
    rank = jnp.asarray(g.integers(0, N, D, dtype=np.int32))
    gmap = jnp.asarray(g.integers(0, N, N, dtype=np.int32))
    timeit("1D gather gmap[rank] (D,)", lambda m, r: m[r], gmap, rank)


if __name__ == "__main__":
    main()
