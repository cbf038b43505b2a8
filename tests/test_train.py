"""End-to-end training smoke tests: the optimizer must actually fit scenes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.core.cameras import make_camera
from sugar_tpu.models.gaussians import create_from_pcd
from sugar_tpu.models.render import render_model
from sugar_tpu.trainers import optimizer as opt
from sugar_tpu.trainers.vanilla import TrainConfig, train_vanilla_3dgs


def _ring_cameras(n=4, radius=4.0, h=64, w=64):
    cams = []
    for i in range(n):
        th = 2 * np.pi * i / n
        # Camera at radius looking at origin: build world-to-cam.
        fwd = -np.array([np.cos(th), 0.0, np.sin(th)])  # towards origin
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        Rwc = np.stack([right, up2, fwd], axis=0)  # world->cam rows
        center = -fwd * radius
        T = -Rwc @ center
        cams.append(
            make_camera(R=Rwc.T, T=T, fov_x=1.0, fov_y=1.0, height=h, width=w)
        )
    return cams


def _target_scene(seed=0, n=100):
    g = np.random.default_rng(seed)
    pts = g.normal(size=(n, 3)).astype(np.float32) * 0.5
    cols = g.uniform(0.2, 1.0, (n, 3)).astype(np.float32)
    return pts, cols


class TestVanillaTraining:
    def test_loss_decreases_and_fits(self):
        pts, cols = _target_scene()
        cams = _ring_cameras(n=4)

        # Ground-truth images rendered from a reference model (opacity
        # boosted so there is something to see).
        target_model = create_from_pcd(pts, cols, capacity=256, sh_degree=0,
                                       initial_opacity=0.9)
        gts = [
            np.asarray(
                jnp.clip(render_model(target_model, c, dup_capacity=4096, k_max=256)["image"], 0, 1)
            )
            for c in cams
        ]

        # Train from the SfM points but neutral colors.
        g = np.random.default_rng(1)
        init_cols = np.full((100, 3), 0.5, np.float32)
        cfg = TrainConfig(
            iterations=200,
            capacity=256,
            sh_degree=0,
            sh_warmup_every=1,
            # Densification semantics are unit-tested in test_models; with the
            # boosted LRs of this short run it would churn the population, so
            # keep it off and assert pure optimization quality here.
            densify_from=10_000,
            densify_until=10_000,
            densify_every=25,
            opacity_reset_every=10_000,
            dup_capacity_mult=16,
            k_max=256,
            log_every=50,
            # Boosted LRs so the tiny-iteration test converges; the reference
            # schedule is exercised by the defaults elsewhere.
            optim=opt.OptimConfig(
                position_lr_init=0.0016, position_lr_final=0.00016,
                feature_lr=0.05, opacity_lr=0.1,
            ),
        )
        logs = []
        state = train_vanilla_3dgs(
            cams, gts, pts + 0.02 * g.normal(size=pts.shape).astype(np.float32),
            init_cols, extent=2.0, cfg=cfg, log_fn=logs.append,
        )
        # Render from camera 0 and compare.
        out = render_model(
            state.model, cams[0], dup_capacity=16 * 256, k_max=256
        )
        img = np.asarray(jnp.clip(out["image"], 0, 1))
        mse = float(np.mean((img - gts[0]) ** 2))
        psnr = -10 * np.log10(mse + 1e-12)
        assert psnr > 22.0, f"train did not fit: psnr={psnr}"

    def test_step_is_jittable_and_finite(self):
        pts, cols = _target_scene(seed=2, n=50)
        cams = _ring_cameras(n=2, h=32, w=32)
        model = create_from_pcd(pts, cols, capacity=64, sh_degree=1)
        gts = [np.full((32, 32, 3), 0.3, np.float32)] * 2
        cfg = TrainConfig(
            iterations=5, capacity=64, sh_degree=1, densify_from=10_000,
            dup_capacity_mult=32, k_max=64, log_every=1,
        )
        logs = []
        state = train_vanilla_3dgs(
            cams, gts, pts, cols, extent=2.0, cfg=cfg, log_fn=logs.append
        )
        assert all(np.isfinite(l["loss"]) for l in logs if "loss" in l)
        for leaf in jax.tree.leaves(state.model.params):
            assert np.isfinite(np.asarray(leaf)).all()
