"""Unit tests for the MXU segment-sum kernel (raster/segsum.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.raster.segsum import segment_sum_sorted


def _naive(ct, gid, n):
    out = np.zeros((ct.shape[0], n), np.float32)
    for d in range(ct.shape[1]):
        g = int(gid[d])
        if g < n:
            out[:, g] += ct[:, d]
    return out


def _case(rng, n, d, seg):
    counts = rng.integers(0, seg + 1, n)
    gid = np.repeat(np.arange(n), counts)[:d]
    if len(gid) < d:
        gid = np.concatenate([gid, np.full(d - len(gid), n)])
    gid = np.sort(gid).astype(np.int32)
    ct = rng.normal(size=(16, d)).astype(np.float32)
    # Sentinel-slot data must be dropped even when nonzero.
    ct[:, gid >= n] = rng.normal(size=(16, int((gid >= n).sum())))
    return ct, gid


class TestSegmentSum:
    def test_kernel_interpret_matches_naive(self):
        rng = np.random.default_rng(0)
        for n, d, seg in [(64, 100, 5), (1000, 3000, 16), (300, 257, 3)]:
            ct, gid = _case(rng, n, d, seg)
            out = np.asarray(
                segment_sum_sorted(jnp.asarray(ct), jnp.asarray(gid), n,
                                   force_kernel=True)
            )
            np.testing.assert_allclose(out, _naive(ct, gid, n),
                                       rtol=1e-5, atol=1e-5)

    def test_reference_fallback_matches_naive(self):
        rng = np.random.default_rng(1)
        for n, d, seg in [(64, 100, 5), (500, 4096, 16)]:
            ct, gid = _case(rng, n, d, seg)
            out = np.asarray(
                segment_sum_sorted(jnp.asarray(ct), jnp.asarray(gid), n)
            )
            np.testing.assert_allclose(out, _naive(ct, gid, n),
                                       rtol=1e-5, atol=1e-5)

    def test_odd_rows_padded(self):
        rng = np.random.default_rng(2)
        ct, gid = _case(rng, 128, 512, 4)
        ct9 = ct[:9]
        out = np.asarray(
            segment_sum_sorted(jnp.asarray(ct9), jnp.asarray(gid), 128,
                               force_kernel=True)
        )
        assert out.shape == (9, 128)
        np.testing.assert_allclose(out, _naive(ct9, gid, 128),
                                   rtol=1e-5, atol=1e-5)

    def test_sparse_id_spans(self):
        # Ids jumping by thousands within one chunk exercise the
        # multi-sub-window path and its half-open ownership (no double
        # counting at window overlaps).
        rng = np.random.default_rng(3)
        n = 50_000
        gid = np.sort(rng.choice(n, size=2048, replace=False)).astype(np.int32)
        ct = rng.normal(size=(16, 2048)).astype(np.float32)
        out = np.asarray(
            segment_sum_sorted(jnp.asarray(ct), jnp.asarray(gid), n,
                               force_kernel=True)
        )
        np.testing.assert_allclose(out, _naive(ct, gid, n),
                                   rtol=1e-5, atol=1e-5)
