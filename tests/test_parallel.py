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


class TestShardedTraining:
    def test_sharded_loop_descends(self):
        import jax.numpy as jnp

        from sugar_tpu.core.cameras import make_camera
        from sugar_tpu.models.gaussians import create_from_pcd
        from sugar_tpu.models.render import render_model
        from sugar_tpu.parallel.trainer import train_vanilla_sharded
        from sugar_tpu.trainers import optimizer as opt
        from sugar_tpu.trainers.vanilla import TrainConfig

        g = np.random.default_rng(0)
        pts = g.normal(size=(60, 3)).astype(np.float32) * 0.4
        cols = g.uniform(0.3, 1.0, (60, 3)).astype(np.float32)
        target = create_from_pcd(pts, cols, capacity=64, sh_degree=0,
                                 initial_opacity=0.9)
        cams, gts = [], []
        for i in range(8):
            th = 2 * np.pi * i / 8
            fwd = -np.array([np.cos(th), 0.1, np.sin(th)])
            fwd /= np.linalg.norm(fwd)
            up = np.array([0.0, 1.0, 0.0])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            Rwc = np.stack([right, np.cross(fwd, right), fwd], 0)
            cam = make_camera(R=Rwc.T, T=-Rwc @ (-fwd * 3), fov_x=1.0, fov_y=1.0,
                              height=32, width=32)
            cams.append(cam)
            gts.append(np.asarray(jnp.clip(
                render_model(target, cam, dup_capacity=2048, k_max=64)["image"], 0, 1)))

        logs = []
        cfg = TrainConfig(
            iterations=48, capacity=64, sh_degree=0, sh_warmup_every=1,
            densify_from=10_000, densify_until=10_000, dup_capacity_mult=32,
            k_max=64, log_every=4,
            optim=opt.OptimConfig(feature_lr=0.05, opacity_lr=0.1),
        )
        model = train_vanilla_sharded(
            cams, gts, pts, np.full_like(cols, 0.5), extent=1.5, cfg=cfg,
            n_data=4, n_gauss=2, log_fn=logs.append,
        )
        assert logs and logs[-1]["loss"] < logs[0]["loss"]
        for leaf in jax.tree.leaves(model.params):
            assert np.isfinite(np.asarray(leaf)).all()


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


class TestShardedTileRender:
    """shard_map tile-band renderer vs the single-device pallas path."""

    def _scene(self, n=512, h=128, w=64, seed=11):
        from test_raster import make_scene, make_settings

        means, scales, quats, opac, colors = make_scene(n=n, seed=seed)
        st = make_settings(h=h, w=w, bg=(0.15, 0.25, 0.35))
        return (means, scales, quats, opac, colors), st

    def test_matches_single_device(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.experimental.pallas import tpu as pltpu

        from sugar_tpu.parallel.mesh import make_mesh
        from sugar_tpu.parallel.render import render_sharded
        from sugar_tpu.raster.api import rasterize_gaussians

        (means, scales, quats, opac, colors), st = self._scene()
        mesh = make_mesh(n_data=8, n_gauss=1)
        mesh = jax.sharding.Mesh(mesh.devices.reshape(-1), ("shard",))
        args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))

        with pltpu.force_tpu_interpret_mode():
            ref = rasterize_gaussians(
                args[0], args[3], st, scales=args[1], quaternions=args[2],
                colors=args[4], mode="pallas", tile_cap=40, dup_capacity=2**15,
                k_max=512,
            )
            out = jax.jit(
                lambda m, s, q, o, c: render_sharded(
                    mesh, "shard", m, o, st, scales=s, quaternions=q, colors=c,
                    tile_cap=40, k_max=512, use_kernel=False,
                )
            )(*args)
        np.testing.assert_allclose(
            np.asarray(out["image"]), np.asarray(ref["image"]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["final_T"]), np.asarray(ref["final_T"]), atol=2e-5
        )
        assert int(out["route_overflow"]) == 0

    def test_grads_match_single_device(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.experimental.pallas import tpu as pltpu

        from sugar_tpu.parallel.mesh import make_mesh
        from sugar_tpu.parallel.render import render_sharded
        from sugar_tpu.raster.api import rasterize_gaussians

        (means, scales, quats, opac, colors), st = self._scene(n=256)
        mesh = make_mesh(n_data=8, n_gauss=1)
        mesh = jax.sharding.Mesh(mesh.devices.reshape(-1), ("shard",))
        args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))
        tgt = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (st.image_height, st.image_width, 3)).astype(np.float32)
        )

        def loss_sharded(m, s, q, o, c):
            out = render_sharded(
                mesh, "shard", m, o, st, scales=s, quaternions=q, colors=c,
                tile_cap=40, k_max=512, use_kernel=False,
            )
            return jnp.mean((out["image"] - tgt) ** 2)

        def loss_single(m, s, q, o, c):
            out = rasterize_gaussians(
                m, o, st, scales=s, quaternions=q, colors=c,
                mode="pallas", tile_cap=40, dup_capacity=2**15, k_max=512,
            )
            return jnp.mean((out["image"] - tgt) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g_sh = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4)))(*args)
            g_si = jax.jit(jax.grad(loss_single, argnums=(0, 1, 2, 3, 4)))(*args)
        for a, b in zip(g_si, g_sh):
            scale = max(float(jnp.max(jnp.abs(a))), 1e-8)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-5 * scale + 1e-9
            )


    def test_kernel_smoke_two_devices(self):
        # Tiny interpret-mode run of the real Pallas compositor inside
        # shard_map (2 devices) — checks the kernel/shard_map composition.
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.experimental.pallas import tpu as pltpu

        from sugar_tpu.parallel.render import render_sharded
        from sugar_tpu.raster.api import rasterize_gaussians

        (means, scales, quats, opac, colors), st = self._scene(n=64, h=32, w=32)
        mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:2]), ("shard",))
        args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))
        with pltpu.force_tpu_interpret_mode():
            out = jax.jit(
                lambda m, s, q, o, c: render_sharded(
                    mesh, "shard", m, o, st, scales=s, quaternions=q, colors=c,
                    tile_cap=4, k_max=256,
                )["image"]
            )(*args)
            ref = rasterize_gaussians(
                args[0], args[3], st, scales=args[1], quaternions=args[2],
                colors=args[4], mode="pallas", tile_cap=4, dup_capacity=2**12,
                k_max=256,
            )["image"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestShardedKNN:
    def test_matches_single_device(self):
        import jax.numpy as jnp

        from sugar_tpu.fields.knn import knn
        from sugar_tpu.parallel.knn import knn_sharded

        g = np.random.default_rng(5)
        q = jnp.asarray(g.normal(size=(64, 3)).astype(np.float32))
        r = jnp.asarray(g.normal(size=(96, 3)).astype(np.float32))
        mask = jnp.asarray(g.uniform(size=96) > 0.2)
        mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("shard",))
        d_ref, i_ref = knn(q, r, k=5, ref_mask=mask)
        d_sh, i_sh = knn_sharded(mesh, "shard", q, r, k=5, ref_mask=mask)
        np.testing.assert_allclose(
            np.asarray(d_sh), np.asarray(d_ref), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_ref))

    def test_non_divisible_counts_pad_internally(self):
        """Q/R not divisible by the axis size must pad, not assert
        (ADVICE r4: e.g. 3- or 6-device meshes)."""
        import jax.numpy as jnp

        from sugar_tpu.fields.knn import knn
        from sugar_tpu.parallel.knn import knn_sharded

        g = np.random.default_rng(9)
        q = jnp.asarray(g.normal(size=(50, 3)).astype(np.float32))
        r = jnp.asarray(g.normal(size=(71, 3)).astype(np.float32))
        mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:3]), ("shard",))
        d_ref, i_ref = knn(q, r, k=4)
        d_sh, i_sh = knn_sharded(mesh, "shard", q, r, k=4)
        assert d_sh.shape == (50, 4)
        np.testing.assert_allclose(
            np.asarray(d_sh), np.asarray(d_ref), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_ref))

    def test_self_knn_includes_self(self):
        import jax.numpy as jnp

        from sugar_tpu.parallel.knn import knn_sharded

        g = np.random.default_rng(7)
        pts = jnp.asarray(g.normal(size=(32, 3)).astype(np.float32))
        mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:4]), ("shard",))
        d, i = knn_sharded(mesh, "shard", pts, pts, k=3)
        np.testing.assert_array_equal(np.asarray(i[:, 0]), np.arange(32))
        assert float(jnp.max(d[:, 0])) < 1e-10


class TestShardedCoarse:
    def _scene(self, capacity=64, n_cams=4, h=24, w=24):
        import jax.numpy as jnp

        from sugar_tpu.core.cameras import Cameras, make_camera
        from sugar_tpu.models.gaussians import create_from_pcd

        g = np.random.default_rng(11)
        pts = g.normal(size=(48, 3)).astype(np.float32) * 0.4
        cols = g.uniform(0.2, 1.0, (48, 3)).astype(np.float32)
        model = create_from_pcd(pts, cols, capacity, sh_degree=1,
                                initial_opacity=0.8)
        cams = []
        for i in range(n_cams):
            th = 2 * np.pi * i / n_cams
            fwd = -np.array([np.cos(th), 0.1, np.sin(th)])
            fwd /= np.linalg.norm(fwd)
            up = np.array([0.0, 1.0, 0.0])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            Rwc = np.stack([right, np.cross(fwd, right), fwd], 0)
            cams.append(make_camera(R=Rwc.T, T=-Rwc @ (-fwd * 3), fov_x=1.0,
                                    fov_y=1.0, height=h, width=w))
        gts = jnp.asarray(g.uniform(0, 1, (n_cams, h, w, 3)).astype(np.float32))
        return model, Cameras.stack(cams), gts

    def test_matches_single_device(self):
        import dataclasses

        import jax.numpy as jnp

        from sugar_tpu.fields.knn import knn
        from sugar_tpu.parallel.coarse import make_sharded_coarse_step
        from sugar_tpu.parallel.mesh import make_mesh, shard_params
        from sugar_tpu.trainers import optimizer as opt
        from sugar_tpu.trainers.coarse import CoarseConfig
        from sugar_tpu.trainers.schedule import iteration_key

        model, cams, gts = self._scene()
        cfg = CoarseConfig(
            mode="sdf", n_samples_for_sdf_regularization=2048,
            knn_to_track=8, k_max=256, sh_degree=1,
        )
        lrs = opt.group_lrs(cfg.optim, spatial_lr_scale=1.5)
        _, knn_idx = knn(model.params.xyz, model.params.xyz, k=8,
                         ref_mask=model.alive)
        rngs = jnp.stack([
            jax.random.key_data(iteration_key(0, i)) for i in range(4)
        ])
        it = jnp.asarray(7_001, jnp.int32)

        def run(mesh):
            step = make_sharded_coarse_step(
                mesh, cfg, lrs, extent=1.5, dup_capacity=2048,
                with_entropy=True, with_sdf=True,
            )
            params = shard_params(jax.tree.map(jnp.copy, model.params), mesh)
            adam = opt.init_adam(model.params)
            adam = dataclasses.replace(
                shard_params(dataclasses.replace(adam, count=None), mesh),
                count=adam.count,
            )
            alive = jax.device_put(
                model.alive,
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("gauss")),
            )
            ki = jax.device_put(
                knn_idx,
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("gauss")),
            )
            cams_s = jax.tree.map(
                lambda x: jax.device_put(
                    x, jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec("data"))),
                cams,
            )
            gts_s = jax.device_put(
                gts, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data")))
            new_params, _, aux = step(params, alive, adam, ki, cams_s, gts_s,
                                      it, rngs)
            return jax.tree.map(np.asarray, new_params), float(aux["loss"])

        p1, l1 = run(make_mesh(n_data=1, n_gauss=1, devices=jax.devices()[:1]))
        p8, l8 = run(make_mesh(n_data=4, n_gauss=2, devices=jax.devices()[:8]))
        assert np.isfinite(l1) and abs(l1 - l8) < 1e-4 * max(1.0, abs(l1))
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


class TestShardedRefine:
    def _mesh_scene(self, n_cams=4, h=24, w=24):
        import jax.numpy as jnp
        from scipy.spatial import ConvexHull

        from sugar_tpu.core.cameras import Cameras, make_camera
        from sugar_tpu.refine import bound as B

        g = np.random.default_rng(17)
        u = g.normal(size=(40, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        verts = (u * 0.8).astype(np.float32)
        faces = ConvexHull(verts).simplices.astype(np.int64)
        vc = g.uniform(0.2, 1.0, (len(verts), 3)).astype(np.float32)
        params, bm = B.init_bound_params(
            verts, faces, vc, n_gaussians_per_triangle=3, extent=3.0,
            sh_degree=1,
        )
        # Break the s1==s2 / identity-rotation symmetry: a symmetric init
        # gives complex_rot gradients that are pure float noise, and Adam
        # amplifies their (reduction-order-dependent) sign to a full +-lr
        # step — not a sharding bug, just a degenerate comparison point.
        import dataclasses as _dc

        g2 = np.random.default_rng(23)
        ls = np.asarray(params.log_scales)
        cr = np.asarray(params.complex_rot)
        ang = g2.uniform(-0.5, 0.5, len(cr)).astype(np.float32)
        params = _dc.replace(
            params,
            log_scales=jnp.asarray(
                ls + g2.uniform(-0.5, 0.5, ls.shape).astype(np.float32)
            ),
            complex_rot=jnp.asarray(
                np.stack([np.cos(ang), np.sin(ang)], -1)
            ),
        )
        pairs = jnp.asarray(B.normal_consistency_pairs(faces))
        cams = []
        for i in range(n_cams):
            th = 2 * np.pi * i / n_cams
            fwd = -np.array([np.cos(th), 0.1, np.sin(th)])
            fwd /= np.linalg.norm(fwd)
            up = np.array([0.0, 1.0, 0.0])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            Rwc = np.stack([right, np.cross(fwd, right), fwd], 0)
            cams.append(make_camera(R=Rwc.T, T=-Rwc @ (-fwd * 3), fov_x=1.0,
                                    fov_y=1.0, height=h, width=w))
        gts = jnp.asarray(g.uniform(0, 1, (n_cams, h, w, 3)).astype(np.float32))
        return params, bm, pairs, Cameras.stack(cams), gts

    def test_matches_single_device(self):
        import jax.numpy as jnp

        from sugar_tpu.parallel.mesh import make_mesh
        from sugar_tpu.parallel.refine import (
            make_sharded_refine_step,
            shard_bound_state,
        )
        from sugar_tpu.refine.trainer import (
            RefineConfig,
            bound_lrs,
            init_bound_adam,
        )

        params0, bm, pairs, cams, gts = self._mesh_scene()
        cfg = RefineConfig(
            num_iterations=1, n_gaussians_per_triangle=3, sh_degree=1,
            k_max=256,
        )
        lrs = bound_lrs(cfg, spatial_lr_scale=1.0)
        it = jnp.asarray(3, jnp.int32)

        def run(mesh):
            step = make_sharded_refine_step(
                mesh, cfg, bm, pairs, lrs, active_sh_degree=1,
                dup_capacity=8 * params0.opacity_logit.shape[0],
            )
            params, adam = shard_bound_state(
                mesh, jax.tree.map(jnp.copy, params0),
                init_bound_adam(params0),
            )
            data = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data"))
            cams_s = jax.tree.map(lambda x: jax.device_put(x, data), cams)
            gts_s = jax.device_put(gts, data)
            new_params, _, aux = step(params, adam, cams_s, gts_s, it)
            return jax.tree.map(np.asarray, new_params), float(aux["loss"])

        p1, l1 = run(make_mesh(n_data=1, n_gauss=1, devices=jax.devices()[:1]))
        p8, l8 = run(make_mesh(n_data=4, n_gauss=2, devices=jax.devices()[:8]))
        assert np.isfinite(l1) and abs(l1 - l8) < 1e-4 * max(1.0, abs(l1))
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


class TestShardedMeshing:
    def test_cloud_identical_1_vs_8_devices(self):
        import jax.numpy as jnp

        from sugar_tpu.core.cameras import make_camera
        from sugar_tpu.meshing.levelset import collect_surface_points
        from sugar_tpu.models.gaussians import create_from_pcd
        from sugar_tpu.parallel.meshing import collect_surface_points_sharded

        g = np.random.default_rng(3)
        # Surface-ish blob: points on a sphere shell
        u = g.normal(size=(96, 3)); u /= np.linalg.norm(u, axis=1, keepdims=True)
        pts = (u * 0.8).astype(np.float32)
        cols = g.uniform(0.2, 1, (96, 3)).astype(np.float32)
        model = create_from_pcd(pts, cols, 128, sh_degree=0, initial_opacity=0.95)
        cams = []
        for i in range(5):
            th = 2 * np.pi * i / 5
            fwd = -np.array([np.cos(th), 0.1, np.sin(th)])
            fwd /= np.linalg.norm(fwd)
            up = np.array([0.0, 1.0, 0.0])
            right = np.cross(up, fwd); right /= np.linalg.norm(right)
            Rwc = np.stack([right, np.cross(fwd, right), fwd], 0)
            cams.append(make_camera(R=Rwc.T, T=-Rwc @ (-fwd * 3), fov_x=1.0,
                                    fov_y=1.0, height=24, width=24))
        kw = dict(surface_level=0.3, total_points=2000, dup_capacity=4096,
                  k_max=256)
        ref = collect_surface_points(model, cams,
                                     rng=np.random.default_rng(9), **kw)
        mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("data",))
        sh = collect_surface_points_sharded(mesh, "data", model, cams,
                                            rng=np.random.default_rng(9), **kw)
        assert len(ref["points"]) > 50
        np.testing.assert_allclose(sh["points"], ref["points"], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(sh["normals"], ref["normals"], rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(sh["gaussian_idx"], ref["gaussian_idx"])
