"""Tests for mesh-bound Gaussians and the refinement loop."""

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.core.quaternions import quaternion_to_matrix
from sugar_tpu.refine import bound as B


def flat_quad_mesh():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return verts, faces


class TestBinding:
    def test_centers_barycentric(self):
        verts, faces = flat_quad_mesh()
        params, bm = B.init_bound_params(verts, faces, None, 1, extent=1.0)
        centers = np.asarray(B.gaussian_centers(params, bm))
        assert centers.shape == (2, 3)
        np.testing.assert_allclose(
            centers[0], verts[faces[0]].mean(axis=0), atol=1e-6
        )

    def test_centers_multi_per_triangle(self):
        verts, faces = flat_quad_mesh()
        for gpt in (3, 4, 6):
            params, bm = B.init_bound_params(verts, faces, None, gpt, extent=1.0)
            centers = np.asarray(B.gaussian_centers(params, bm))
            assert centers.shape == (2 * gpt, 3)
            # All centers inside the triangle plane z=0.
            np.testing.assert_allclose(centers[:, 2], 0.0, atol=1e-6)

    def test_scales_thickness_first(self):
        verts, faces = flat_quad_mesh()
        params, bm = B.init_bound_params(verts, faces, None, 1, extent=2.0)
        scales = np.asarray(B.gaussian_scales(params, bm))
        np.testing.assert_allclose(scales[:, 0], 2.0 / 1e6, rtol=1e-5)
        assert (scales[:, 1:] > 1e-4).all()

    def test_quaternion_normal_axis(self):
        verts, faces = flat_quad_mesh()
        params, bm = B.init_bound_params(verts, faces, None, 1, extent=1.0)
        q = B.gaussian_quaternions(params, bm)
        R = np.asarray(quaternion_to_matrix(q))
        # First column of R = face normal = +-z for the flat quad.
        np.testing.assert_allclose(np.abs(R[:, 2, 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(R[:, :2, 0], 0.0, atol=1e-5)

    def test_complex_rotation_rotates_in_plane(self):
        verts, faces = flat_quad_mesh()
        params, bm = B.init_bound_params(verts, faces, None, 1, extent=1.0)
        import dataclasses

        th = 0.7
        p2 = dataclasses.replace(
            params,
            complex_rot=jnp.asarray(
                np.tile([np.cos(th), np.sin(th)], (2, 1)).astype(np.float32)
            ),
        )
        q1 = B.gaussian_quaternions(params, bm)
        q2 = B.gaussian_quaternions(p2, bm)
        R1 = np.asarray(quaternion_to_matrix(q1))
        R2 = np.asarray(quaternion_to_matrix(q2))
        # Normal axis unchanged; in-plane axes rotated by theta.
        np.testing.assert_allclose(R1[:, :, 0], R2[:, :, 0], atol=1e-5)
        cos_angle = np.sum(R1[:, :, 1] * R2[:, :, 1], axis=-1)
        np.testing.assert_allclose(cos_angle, np.cos(th), atol=1e-5)

    def test_normal_consistency(self):
        verts, faces = flat_quad_mesh()
        pairs = B.normal_consistency_pairs(faces)
        assert pairs.shape == (1, 2)
        loss = B.normal_consistency_loss(jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(pairs))
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)
        # Fold the quad: loss grows.
        verts2 = verts.copy()
        verts2[3, 2] = 1.0
        loss2 = B.normal_consistency_loss(jnp.asarray(verts2), jnp.asarray(faces), jnp.asarray(pairs))
        assert float(loss2) > 0.1

    def test_laplacian_smoothing(self):
        verts, faces = flat_quad_mesh()
        idx, mask = B.vertex_adjacency(faces, 4)
        l1 = B.laplacian_uniform_loss(jnp.asarray(verts), jnp.asarray(idx), jnp.asarray(mask))
        assert np.isfinite(float(l1))
        g = jax.grad(
            lambda v: B.laplacian_uniform_loss(v, jnp.asarray(idx), jnp.asarray(mask))
        )(jnp.asarray(verts))
        assert np.isfinite(np.asarray(g)).all()


class TestRefinement:
    def test_short_refine_runs_and_descends(self):
        from sugar_tpu.core.cameras import make_camera
        from sugar_tpu.refine.trainer import RefineConfig, refined_training

        # Simple planar mesh facing a camera; target = constant color image.
        n = 6
        xs = np.linspace(-0.8, 0.8, n)
        vv, ff = [], []
        for i in range(n):
            for j in range(n):
                vv.append([xs[i], xs[j], 2.0])
        for i in range(n - 1):
            for j in range(n - 1):
                a = i * n + j
                ff.append([a, a + 1, a + n])
                ff.append([a + 1, a + n + 1, a + n])
        verts = np.array(vv, np.float32)
        faces = np.array(ff, np.int64)
        cam = make_camera(R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.2, height=48, width=48)
        gt = np.full((48, 48, 3), 0.8, np.float32)
        logs = []
        cfg = RefineConfig(
            num_iterations=40, n_gaussians_per_triangle=3, sh_degree=0,
            sh_warmup_every=1, k_max=128, dup_capacity_mult=32, log_every=10,
            feature_lr=0.05, opacity_lr=0.1,
        )
        params, bm = refined_training(
            verts, faces, None, [cam], [gt], extent=2.0, cfg=cfg, log_fn=logs.append
        )
        assert logs, "no logs"
        assert logs[-1]["loss"] < logs[0]["loss"]
        for leaf in jax.tree.leaves(params):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_export_refined_ply(self, tmp_path):
        from sugar_tpu.refine.trainer import export_refined_ply
        from sugar_tpu.io.ply import load_gaussian_ply

        verts, faces = flat_quad_mesh()
        params, bm = B.init_bound_params(verts, faces, None, 3, extent=1.0, sh_degree=2)
        p = str(tmp_path / "refined.ply")
        export_refined_ply(params, bm, p)
        d = load_gaussian_ply(p)
        assert d["xyz"].shape == (6, 3)
        assert d["sh_rest"].shape == (6, 3, 8)
        assert d["log_scales"].shape == (6, 3)
