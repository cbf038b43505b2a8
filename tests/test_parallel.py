"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import jax
import numpy as np
import pytest


class TestMesh:
    def test_make_mesh_shapes(self):
        from sugar_tpu.parallel.mesh import make_mesh

        m = make_mesh()
        assert m.devices.size == 8
        m2 = make_mesh(n_data=4, n_gauss=2)
        assert m2.shape == {"data": 4, "gauss": 2}

    def test_shard_params_placement(self):
        import jax.numpy as jnp

        from sugar_tpu.parallel.mesh import gauss_sharding, make_mesh, shard_params

        mesh = make_mesh(n_data=4, n_gauss=2)
        x = jnp.zeros((64, 3))
        y = shard_params(x, mesh)
        assert y.sharding == gauss_sharding(mesh)


class TestDryrun:
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_dryrun_odd_devices(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(4)


class TestRegularizers:
    def test_overlap_identical_gaussians(self):
        import jax.numpy as jnp

        from sugar_tpu.fields.density import GaussianFieldParams
        from sugar_tpu.fields.regularizers import (
            gaussian_alignment_with_neighbors,
            gaussian_overlap_with_neighbors,
        )

        # Two coincident gaussians: overlap of center sample = 1.
        gp = GaussianFieldParams(
            centers=jnp.zeros((2, 3)),
            scales=jnp.full((2, 3), 0.1),
            quaternions=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)),
            opacities=jnp.asarray([0.5, 0.5]),
        )
        nb = jnp.asarray([[0, 1], [1, 0]], jnp.int32)
        ov = gaussian_overlap_with_neighbors(gp, nb)
        np.testing.assert_allclose(np.asarray(ov), 1.0, atol=1e-6)

        # Two gaussians exactly 2 sigma apart along x: alignment residual 0.
        gp2 = GaussianFieldParams(
            centers=jnp.asarray([[0.0, 0, 0], [0.2, 0, 0]]),
            scales=jnp.full((2, 3), 0.1),
            quaternions=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)),
            opacities=jnp.asarray([0.5, 0.5]),
        )
        al = gaussian_alignment_with_neighbors(gp2, nb)
        np.testing.assert_allclose(np.asarray(al), 0.0, atol=1e-5)


class TestDeformationTransfer:
    def test_identity_deformation_is_noop(self):
        import jax.numpy as jnp

        from sugar_tpu.refine import bound as B

        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        params, bm = B.init_bound_params(verts, faces, None, 3, extent=1.0)
        q_ref = B.gaussian_quaternions(params, bm)
        s_ref = B.gaussian_scales(params, bm)
        q_ed, s_ed = B.edited_quaternions_and_scales(
            params, bm, jnp.asarray(verts)
        )
        # Identity deformation: same rotation (up to sign) and scales.
        from sugar_tpu.core.quaternions import quaternion_to_matrix

        np.testing.assert_allclose(
            np.asarray(quaternion_to_matrix(q_ed)),
            np.asarray(quaternion_to_matrix(q_ref)),
            atol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(s_ed), np.asarray(s_ref), rtol=1e-4)

    def test_uniform_stretch_scales(self):
        import dataclasses

        import jax.numpy as jnp

        from sugar_tpu.refine import bound as B

        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        params, bm = B.init_bound_params(verts, faces, None, 1, extent=1.0)
        # Deform: stretch x2 in-plane. The reference's adjustment
        # (sugar_model.py:633-659) is a per-corner projective approximation,
        # so scales grow toward (but not exactly to) the 2x factor.
        p2 = dataclasses.replace(params, vertices=params.vertices * 2.0)
        _, s_ed = B.edited_quaternions_and_scales(p2, bm, jnp.asarray(verts))
        s0 = np.asarray(B.gaussian_scales(params, bm))
        ratio = np.asarray(s_ed)[:, 1:] / s0[:, 1:]
        assert (ratio > 1.1).all() and (ratio < 2.01).all(), ratio
