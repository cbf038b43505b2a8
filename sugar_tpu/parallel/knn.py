"""Multi-chip exact k-NN: ring exchange of reference shards over ICI.

The reference's KNN (PyTorch3D ``knn_points``, sugar_model.py:1028) is
single-GPU; this is the distributed counterpart required by SURVEY.md §2.9
row 6. Design (scaling-book ring pattern): queries AND references are
sharded along one mesh axis; each of the D ring steps computes the local
query shard against the currently-held reference shard (MXU brute force, as
in fields/knn.py) and merges into a running top-k, then ``ppermute``s the
reference shard (+mask +base offset) one hop around the ring. Every chip
touches every reference exactly once, all traffic rides neighbor-to-neighbor
ICI, and no chip ever holds more than 1/D of the reference set — the memory
profile that lets KNN-500 refreshes scale past a single chip's HBM.

Returned indices are GLOBAL reference indices, so the result is a drop-in
replacement for fields.knn.knn on the unsharded arrays (ties between
exactly-equal distances may resolve to a different neighbor, as with any
re-ordered reduction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def knn_sharded(
    mesh: Mesh,
    axis: str,
    queries: jnp.ndarray,  # (Q, 3) — Q divisible by mesh.shape[axis]
    refs: jnp.ndarray,  # (R, 3) — R divisible by mesh.shape[axis]
    k: int,
    ref_mask: jnp.ndarray | None = None,  # (R,) bool
    q_chunk: int = 4096,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sq_dists (Q, k), global idx (Q, k)) ascending, sharded on
    ``axis`` along dim 0."""
    n_dev = mesh.shape[axis]
    q_orig = queries.shape[0]
    if ref_mask is None:
        ref_mask = jnp.ones((refs.shape[0],), bool)
    # Pad queries/refs to multiples of the axis size so any device count
    # works (pad refs are masked out; pad query rows are sliced off).
    def _pad_to(x, mult, fill=0.0):
        r = (-x.shape[0]) % mult
        if r == 0:
            return x
        pad = jnp.full((r,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad], axis=0)

    queries = _pad_to(queries, n_dev)
    refs = _pad_to(refs, n_dev)
    ref_mask = _pad_to(ref_mask, n_dev, fill=False)
    q_n = queries.shape[0]
    r_n = refs.shape[0]
    shard = r_n // n_dev

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    def ring(q, r, m):
        my = jax.lax.axis_index(axis)

        def ring_step(carry, step):
            best_d, best_i, r_cur, m_cur = carry
            # After t forward rotations device i holds the shard that
            # started on device (i - t) mod D.
            src = jax.lax.rem(my - step + n_dev, n_dev)
            base = src * shard

            # Local (q_shard, r_shard) brute force in q-chunks, merged into
            # the running top-k (same MXU formulation as fields.knn).
            rr = jnp.sum(r_cur * r_cur, axis=-1)  # (S,)
            ridx = base + jnp.arange(shard, dtype=jnp.int32)

            def one_q_chunk(args):
                qc, bd, bi = args  # (C, 3), (C, k), (C, k)
                qq = jnp.sum(qc * qc, axis=-1, keepdims=True)
                d = qq - 2.0 * qc @ r_cur.T + rr[None, :]
                d = jnp.where(m_cur[None, :], d, jnp.inf)
                cat_d = jnp.concatenate([bd, d], axis=1)
                cat_i = jnp.concatenate(
                    [bi, jnp.broadcast_to(ridx[None, :], d.shape)], axis=1
                )
                neg_top, arg = jax.lax.top_k(-cat_d, k)
                return -neg_top, jnp.take_along_axis(cat_i, arg, axis=1)

            ql = q.shape[0]
            c = min(q_chunk, ql)
            if ql % c != 0:
                c = ql  # tiny shards: single chunk
            nc = ql // c
            nd, ni = jax.lax.map(
                one_q_chunk,
                (
                    q.reshape(nc, c, 3),
                    best_d.reshape(nc, c, k),
                    best_i.reshape(nc, c, k),
                ),
            )
            best_d = nd.reshape(ql, k)
            best_i = ni.reshape(ql, k)

            # Rotate the reference shard one hop around the ring.
            r_next = jax.lax.ppermute(r_cur, axis, perm)
            m_next = jax.lax.ppermute(m_cur, axis, perm)
            return (best_d, best_i, r_next, m_next), None

        ql = q.shape[0]
        # Mark the carry as device-varying up front (axis_index makes the
        # loop outputs varying; scan requires matching carry types).
        init = (
            jax.lax.pcast(
                jnp.full((ql, k), jnp.inf, queries.dtype), (axis,), to="varying"
            ),
            jax.lax.pcast(jnp.zeros((ql, k), jnp.int32), (axis,), to="varying"),
            r,
            m,
        )
        (best_d, best_i, _, _), _ = jax.lax.scan(
            ring_step, init, jnp.arange(n_dev, dtype=jnp.int32)
        )
        order = jnp.argsort(best_d, axis=1, stable=True)
        return (
            jnp.maximum(jnp.take_along_axis(best_d, order, axis=1), 0.0),
            jnp.take_along_axis(best_i, order, axis=1),
        )

    d_out, i_out = ring(queries, refs, ref_mask)
    if q_orig != q_n:
        d_out = d_out[:q_orig]
        i_out = i_out[:q_orig]
    return d_out, i_out
