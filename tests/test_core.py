"""Unit tests for core math: SH, quaternions, transforms, cameras."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sugar_tpu.core import quaternions as quat
from sugar_tpu.core import sh as sh_lib
from sugar_tpu.core import transforms as tf
from sugar_tpu.core.cameras import Cameras, make_camera, spatial_extent


def rng(seed=0):
    return np.random.default_rng(seed)


class TestSH:
    def test_dc_only(self):
        sh = np.zeros((5, 3, 1), np.float32)
        sh[:, :, 0] = 1.0
        dirs = rng().normal(size=(5, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh_lib.eval_sh(0, jnp.asarray(sh), jnp.asarray(dirs))
        np.testing.assert_allclose(out, sh_lib.C0, rtol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_orthonormality(self, deg):
        # Exact quadrature check: int Y_i Y_j dOmega = delta_ij. Products of
        # degree<=4 SH are polynomials, so Gauss-Legendre in cos(theta) x a
        # uniform phi grid integrates them exactly — confirms C0..C4.
        nodes, weights = np.polynomial.legendre.leggauss(12)
        n_phi = 24
        phi = 2 * np.pi * np.arange(n_phi) / n_phi
        z = np.repeat(nodes, n_phi)
        w = np.repeat(weights, n_phi) * (2 * np.pi / n_phi)
        s = np.sqrt(1 - z**2)
        dirs = np.stack(
            [s * np.cos(np.tile(phi, len(nodes))), s * np.sin(np.tile(phi, len(nodes))), z],
            axis=-1,
        ).astype(np.float32)
        n = dirs.shape[0]
        k = sh_lib.num_sh_coeffs(deg)
        basis = []
        for coeff in range(k):
            sh = np.zeros((1, 1, k), np.float32)
            sh[0, 0, coeff] = 1.0
            vals = sh_lib.eval_sh(
                deg, jnp.asarray(np.broadcast_to(sh, (n, 1, k))), jnp.asarray(dirs)
            )
            basis.append(np.asarray(vals)[:, 0])
        basis = np.stack(basis)  # (k, n)
        gram = (basis * w) @ basis.T
        np.testing.assert_allclose(gram, np.eye(k), atol=2e-4)

    def test_rgb_sh_roundtrip(self):
        x = jnp.asarray(rng(3).uniform(size=(10, 3)).astype(np.float32))
        np.testing.assert_allclose(
            sh_lib.sh0_to_rgb(sh_lib.rgb_to_sh0(x)), x, rtol=1e-5, atol=1e-6
        )


class TestQuaternions:
    def test_identity(self):
        q = jnp.array([1.0, 0, 0, 0])
        np.testing.assert_allclose(quat.quaternion_to_matrix(q), np.eye(3), atol=1e-7)

    def test_matrix_is_rotation(self):
        q = quat.normalize(jnp.asarray(rng(4).normal(size=(50, 4)).astype(np.float32)))
        R = quat.quaternion_to_matrix(q)
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (50, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_roundtrip_matrix_quat(self):
        q = quat.normalize(jnp.asarray(rng(5).normal(size=(100, 4)).astype(np.float32)))
        R = quat.quaternion_to_matrix(q)
        q2 = quat.matrix_to_quaternion(R)
        # q and -q are the same rotation; compare matrices.
        R2 = quat.quaternion_to_matrix(q2)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_apply_matches_matrix(self):
        g = rng(6)
        q = quat.normalize(jnp.asarray(g.normal(size=(20, 4)).astype(np.float32)))
        v = jnp.asarray(g.normal(size=(20, 3)).astype(np.float32))
        out1 = quat.quaternion_apply(q, v)
        out2 = jnp.einsum("nij,nj->ni", quat.quaternion_to_matrix(q), v)
        np.testing.assert_allclose(out1, out2, atol=1e-5)

    def test_multiply_compose(self):
        g = rng(7)
        qa = quat.normalize(jnp.asarray(g.normal(size=(20, 4)).astype(np.float32)))
        qb = quat.normalize(jnp.asarray(g.normal(size=(20, 4)).astype(np.float32)))
        qc = quat.quaternion_raw_multiply(qa, qb)
        Rc = quat.quaternion_to_matrix(quat.normalize(qc))
        Rab = jnp.einsum(
            "nij,njk->nik",
            quat.quaternion_to_matrix(qa),
            quat.quaternion_to_matrix(qb),
        )
        np.testing.assert_allclose(Rc, Rab, atol=1e-5)

    def test_invert(self):
        q = quat.normalize(jnp.asarray(rng(8).normal(size=(20, 4)).astype(np.float32)))
        qi = quat.quaternion_invert(q)
        prod = quat.quaternion_raw_multiply(q, qi)
        expected = np.zeros((20, 4), np.float32)
        expected[:, 0] = 1.0
        np.testing.assert_allclose(prod, expected, atol=1e-5)


class TestCameras:
    def test_projection_center(self):
        # A point on the optical axis projects to the image center.
        cam = make_camera(
            R=np.eye(3), T=np.zeros(3), fov_x=1.0, fov_y=0.8, height=120, width=160
        )
        p = jnp.array([[0.0, 0.0, 5.0]])
        h = tf.transform_points_h(cam.full_proj, p)
        ndc = h[0, :2] / h[0, 3]
        np.testing.assert_allclose(ndc, [0.0, 0.0], atol=1e-6)
        pix_x = tf.ndc_to_pix(ndc[0], 160)
        np.testing.assert_allclose(pix_x, (160 - 1) / 2, atol=1e-4)

    def test_projection_fov_edge(self):
        # A point at x = z*tan(fovx/2) lands at ndc x = 1.
        fov_x = 1.0
        cam = make_camera(
            R=np.eye(3), T=np.zeros(3), fov_x=fov_x, fov_y=0.8, height=120, width=160
        )
        z = 3.0
        p = jnp.array([[z * np.tan(fov_x / 2), 0.0, z]])
        h = tf.transform_points_h(cam.full_proj, p)
        np.testing.assert_allclose(h[0, 0] / h[0, 3], 1.0, atol=1e-5)

    def test_principal_point_shift(self):
        cam = make_camera(
            R=np.eye(3), T=np.zeros(3), fov_x=1.0, fov_y=0.8,
            height=120, width=160, cx=100.0, cy=40.0,
        )
        p = jnp.array([[0.0, 0.0, 5.0]])
        h = tf.transform_points_h(cam.full_proj, p)
        ndc = np.asarray(h[0, :2] / h[0, 3])
        pix = tf.ndc_to_pix(ndc, np.array([160, 120]))
        # Optical axis should land on the principal point (+- half pixel
        # from the reference's K-matrix convention).
        np.testing.assert_allclose(pix, [100.0, 40.0], atol=0.51)

    def test_world_view_roundtrip(self):
        g = rng(9)
        q = quat.normalize(jnp.asarray(g.normal(size=(4,)).astype(np.float32)))
        Rwc = np.asarray(quat.quaternion_to_matrix(q))  # world-to-cam
        t = g.normal(size=(3,)).astype(np.float32)
        cam = make_camera(R=Rwc.T, T=t, fov_x=1.0, fov_y=1.0, height=64, width=64)
        # cam_center maps to origin in camera frame.
        pc = tf.transform_points(cam.world_view, cam.cam_center[None])
        np.testing.assert_allclose(pc, np.zeros((1, 3)), atol=1e-5)

    def test_stack_and_extent(self):
        cams = [
            make_camera(
                R=np.eye(3), T=np.array([0.0, 0, float(i)]), fov_x=1.0, fov_y=1.0,
                height=32, width=32,
            )
            for i in range(4)
        ]
        batch = Cameras.stack(cams)
        assert len(batch) == 4
        c2 = batch[2]
        np.testing.assert_allclose(c2.world_view, cams[2].world_view)
        ext = spatial_extent(batch.cam_center)
        np.testing.assert_allclose(ext, 1.1 * 1.5, atol=1e-5)
