"""Tests for KNN and density/SDF field evaluation."""

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.fields import density as df
from sugar_tpu.fields.knn import knn


class TestKNN:
    def test_matches_ckdtree(self):
        from scipy.spatial import cKDTree

        g = np.random.default_rng(0)
        pts = g.normal(size=(3000, 3)).astype(np.float32)
        q = g.normal(size=(500, 3)).astype(np.float32)
        d, i = knn(jnp.asarray(q), jnp.asarray(pts), k=8, q_chunk=256, r_chunk=1024)
        tree = cKDTree(pts)
        d_ref, i_ref = tree.query(q, k=8)
        np.testing.assert_allclose(np.sqrt(np.asarray(d)), d_ref, atol=1e-3)
        # Indices can differ on exact ties; distances are authoritative.
        match = (np.asarray(i) == i_ref).mean()
        assert match > 0.99

    def test_self_knn_includes_self(self):
        g = np.random.default_rng(1)
        pts = g.normal(size=(200, 3)).astype(np.float32)
        d, i = knn(jnp.asarray(pts), jnp.asarray(pts), k=4)
        np.testing.assert_array_equal(np.asarray(i)[:, 0], np.arange(200))
        np.testing.assert_allclose(np.asarray(d)[:, 0], 0.0, atol=1e-6)

    def test_ref_mask(self):
        g = np.random.default_rng(2)
        pts = g.normal(size=(100, 3)).astype(np.float32)
        mask = np.zeros(100, bool)
        mask[:50] = True
        d, i = knn(jnp.asarray(pts[:10]), jnp.asarray(pts), k=5, ref_mask=jnp.asarray(mask))
        assert (np.asarray(i) < 50).all()


def make_field(n=50, seed=0):
    g = np.random.default_rng(seed)
    quats = g.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return df.GaussianFieldParams(
        centers=jnp.asarray(g.normal(size=(n, 3)).astype(np.float32)),
        scales=jnp.asarray(np.exp(g.uniform(-3, -1, (n, 3))).astype(np.float32)),
        quaternions=jnp.asarray(quats),
        opacities=jnp.asarray(g.uniform(0.2, 0.9, n).astype(np.float32)),
    )


class TestDensityField:
    def test_density_at_center_isolated(self):
        # A single isolated Gaussian: density(mu) = opacity.
        gp = df.GaussianFieldParams(
            centers=jnp.zeros((1, 3)),
            scales=jnp.full((1, 3), 0.1),
            quaternions=jnp.asarray([[1.0, 0, 0, 0]]),
            opacities=jnp.asarray([0.7]),
        )
        out = df.field_values(
            jnp.zeros((1, 3)), jnp.zeros((1, 1), jnp.int32), gp, chunk=8
        )
        np.testing.assert_allclose(float(out["density"][0]), 0.7, rtol=1e-6)

    def test_density_falloff_matches_formula(self):
        gp = make_field(n=8)
        g = np.random.default_rng(3)
        x = g.normal(size=(20, 3)).astype(np.float32)
        idx = np.tile(np.arange(8), (20, 1)).astype(np.int32)
        out = df.field_values(jnp.asarray(x), jnp.asarray(idx), gp, chunk=32)
        # Numpy reference.
        from sugar_tpu.core.quaternions import quaternion_to_matrix

        R = np.asarray(quaternion_to_matrix(gp.quaternions))
        exp_d = np.zeros(20)
        for m in range(20):
            for j in range(8):
                shift = x[m] - np.asarray(gp.centers)[j]
                warped = np.diag(1.0 / np.asarray(gp.scales)[j]) @ R[j].T @ shift
                exp_d[m] += np.asarray(gp.opacities)[j] * np.exp(-0.5 * warped @ warped)
        np.testing.assert_allclose(np.asarray(out["density"]), exp_d, rtol=2e-4, atol=1e-30)

    def test_sdf_zero_at_unit_density_level(self):
        # sdf = beta * sqrt(-2 ln d): at density 1, sdf = 0; lower density ->
        # positive sdf growing with distance.
        gp = df.GaussianFieldParams(
            centers=jnp.zeros((1, 3)),
            scales=jnp.full((1, 3), 0.1),
            quaternions=jnp.asarray([[1.0, 0, 0, 0]]),
            opacities=jnp.asarray([1.0]),
        )
        x = jnp.asarray([[0.0, 0, 0], [0.2, 0, 0], [0.4, 0, 0]])
        idx = jnp.zeros((3, 1), jnp.int32)
        out = df.field_values(x, idx, gp, chunk=8, beta_mode="average")
        sdf = np.asarray(out["sdf"])
        np.testing.assert_allclose(sdf[0], 0.0, atol=1e-4)
        assert sdf[1] > 0 and sdf[2] > sdf[1]
        # closed form: d(x) = exp(-0.5 (x/s)^2) -> sdf = beta * |x|/s; beta =
        # min scale = 0.1 -> sdf == |x|.
        np.testing.assert_allclose(sdf[1], 0.2, rtol=1e-3)
        np.testing.assert_allclose(sdf[2], 0.4, rtol=1e-3)

    def test_sdf_grad_direction(self):
        gp = df.GaussianFieldParams(
            centers=jnp.zeros((1, 3)),
            scales=jnp.full((1, 3), 0.1),
            quaternions=jnp.asarray([[1.0, 0, 0, 0]]),
            opacities=jnp.asarray([1.0]),
        )
        x = jnp.asarray([[0.3, 0, 0]])
        out = df.field_values(
            x, jnp.zeros((1, 1), jnp.int32), gp, chunk=8, return_sdf_grad=True
        )
        grad = np.asarray(out["sdf_grad"])[0]
        # Gradient of distance-to-surface points along +x, magnitude ~1.
        assert grad[0] > 0.5
        np.testing.assert_allclose(grad[1:], 0.0, atol=1e-5)

    def test_density_clamp_gradient_passthrough(self):
        gp = df.GaussianFieldParams(
            centers=jnp.zeros((2, 3)),
            scales=jnp.full((2, 3), 0.5),
            quaternions=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)),
            opacities=jnp.asarray([0.9, 0.9]),
        )

        def f(x):
            out = df.field_values(
                x, jnp.tile(jnp.arange(2), (1, 1)).astype(jnp.int32), gp, chunk=8
            )
            return out["sdf"][0]

        g = jax.grad(f)(jnp.asarray([[0.01, 0.0, 0.0]]))
        assert np.isfinite(np.asarray(g)).all()


class TestSampling:
    def test_sample_points_distribution(self):
        gp = df.GaussianFieldParams(
            centers=jnp.asarray([[0.0, 0, 0], [10.0, 0, 0]]),
            scales=jnp.asarray([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]]),
            quaternions=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)),
            opacities=jnp.asarray([0.5, 0.5]),
        )
        alive = jnp.asarray([True, True])
        pts, idx = df.sample_points_in_gaussians(
            jax.random.PRNGKey(0), 4000, gp, alive
        )
        frac1 = float(jnp.mean((idx == 1).astype(jnp.float32)))
        # volume ratio 8:1 -> ~8/9 from gaussian 1.
        assert abs(frac1 - 8 / 9) < 0.05
        # samples from gaussian 0 cluster near origin with std ~0.1
        p0 = np.asarray(pts)[np.asarray(idx) == 0]
        assert np.abs(p0.mean(axis=0)).max() < 0.05
        np.testing.assert_allclose(p0.std(axis=0), 0.1, rtol=0.2)

    def test_dead_not_sampled(self):
        gp = df.GaussianFieldParams(
            centers=jnp.asarray([[0.0, 0, 0], [10.0, 0, 0]]),
            scales=jnp.full((2, 3), 0.1),
            quaternions=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)),
            opacities=jnp.asarray([0.5, 0.5]),
        )
        alive = jnp.asarray([True, False])
        _, idx = df.sample_points_in_gaussians(jax.random.PRNGKey(0), 500, gp, alive)
        assert (np.asarray(idx) == 0).all()


class TestDepthLookup:
    def test_bilinear_exact_on_grid(self):
        g = np.random.default_rng(0)
        depth = g.uniform(1, 5, (16, 20)).astype(np.float32)
        ys, xs = np.meshgrid(np.arange(16), np.arange(20), indexing="ij")
        pix = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.float32)
        out = df.depth_lookup_bilinear(jnp.asarray(depth), jnp.asarray(pix))
        np.testing.assert_allclose(np.asarray(out), depth.reshape(-1), rtol=1e-6)

    def test_bilinear_interpolates(self):
        depth = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])
        out = df.depth_lookup_bilinear(depth, jnp.asarray([[0.5, 0.5]]))
        np.testing.assert_allclose(float(out[0]), 1.5, rtol=1e-6)
