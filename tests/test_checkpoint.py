"""Checkpoint / resume: kill-and-resume reproduces the uninterrupted run.

The reference saves full state_dicts at milestones and downstream stages
reload them (sugar_model.py:2296-2301, coarse_sdf.py:782-793, refine.py:
833-845). These tests assert the stronger TPU-build contract (VERDICT r2
item 6): a trainer killed after a milestone and restarted from it produces
BIT-EXACT final parameters, because camera order and per-iteration RNG are
pure functions of (seed, iteration) (trainers/schedule.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sugar_tpu.core.cameras import make_camera
from sugar_tpu.trainers.schedule import CameraSchedule


def _tiny_scene(n_cams=5, hw=32, n_pts=64, seed=0):
    g = np.random.default_rng(seed)
    d = g.normal(size=(n_pts, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = (0.7 * d).astype(np.float32)
    cols = (0.4 + 0.6 * np.abs(d)).astype(np.float32)
    cams, imgs = [], []
    for i in range(n_cams):
        th = 2 * np.pi * i / n_cams
        fwd = -np.array([np.cos(th), 0.2, np.sin(th)])
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        Rwc = np.stack([right, up2, fwd], 0)
        T = -Rwc @ (-fwd * 2.5)
        cams.append(make_camera(R=Rwc.T, T=T, fov_x=0.8, fov_y=0.8, height=hw, width=hw))
        imgs.append(g.uniform(0, 1, (hw, hw, 3)).astype(np.float32))
    return pts, cols, cams, imgs


def test_camera_schedule_deterministic_and_resumable():
    a = CameraSchedule(3, 7)
    seq = [a.index(i) for i in range(20)]
    # Epoch = permutation of all cameras, consumed back-to-front.
    assert sorted(seq[:7]) == list(range(7))
    assert sorted(seq[7:14]) == list(range(7))
    # A fresh schedule started mid-stream replays the same tail.
    b = CameraSchedule(3, 7)
    assert [b.index(i) for i in range(11, 20)] == seq[11:]


def _run_vanilla(pts, cols, cams, imgs, iters, ckpt_dir=None, start=0, two_phase_at=None):
    from sugar_tpu.trainers.vanilla import TrainConfig, train_vanilla_3dgs

    cfg = TrainConfig(
        iterations=iters, capacity=128, sh_degree=0, sh_warmup_every=1,
        densify_from=4, densify_until=iters, densify_every=5,
        opacity_reset_every=10_000, dup_capacity_mult=16, k_max=256,
        checkpoint_iterations=(two_phase_at,) if two_phase_at else (),
    )
    return train_vanilla_3dgs(
        cams, imgs, pts, cols, extent=2.0, cfg=cfg, seed=0,
        checkpoint_dir=ckpt_dir,
    )


def test_vanilla_kill_and_resume_bit_exact(tmp_path):
    pts, cols, cams, imgs = _tiny_scene()
    total, mid = 14, 7

    full = _run_vanilla(pts, cols, cams, imgs, total)

    ckpt_dir = str(tmp_path / "van")
    # "Killed" run: only reaches the milestone.
    partial = _run_vanilla(pts, cols, cams, imgs, mid, ckpt_dir=ckpt_dir,
                           two_phase_at=mid)
    assert partial.iteration == mid
    # Restart: resumes from the milestone and finishes.
    resumed = _run_vanilla(pts, cols, cams, imgs, total, ckpt_dir=ckpt_dir,
                           two_phase_at=mid)

    for name in ("xyz", "sh_dc", "opacity_logit", "log_scales", "quaternions"):
        np.testing.assert_array_equal(
            np.asarray(getattr(full.model.params, name)),
            np.asarray(getattr(resumed.model.params, name)),
            err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(full.model.alive), np.asarray(resumed.model.alive)
    )
    np.testing.assert_array_equal(
        np.asarray(full.stats.grad_accum), np.asarray(resumed.stats.grad_accum)
    )


def test_coarse_kill_and_resume_bit_exact(tmp_path):
    from sugar_tpu.models.gaussians import create_from_pcd
    from sugar_tpu.trainers.coarse import CoarseConfig, train_coarse

    pts, cols, cams, imgs = _tiny_scene()
    model0 = create_from_pcd(pts, cols, capacity=128, sh_degree=0)
    total, mid = 12, 6

    def run(iters, ckpt_dir=None, milestones=()):
        cfg = CoarseConfig(
            mode="sdf", start_iteration=0, num_iterations=iters,
            entropy_start=1, entropy_end=5, start_sdf_estimation_from=5,
            regularize_from=2, prune_at=(), sh_degree=0,
            reset_neighbors_every=4, n_samples_for_sdf_regularization=2_000,
            k_max=256, dup_capacity_mult=16,
            checkpoint_iterations=milestones,
        )
        return train_coarse(
            model0, cams, imgs, extent=2.0, cfg=cfg, seed=0,
            checkpoint_dir=ckpt_dir,
        )

    full = run(total)
    ckpt_dir = str(tmp_path / "coarse")
    run(mid, ckpt_dir=ckpt_dir, milestones=(mid,))
    resumed = run(total, ckpt_dir=ckpt_dir, milestones=(mid,))

    for name in ("xyz", "opacity_logit", "log_scales", "quaternions"):
        np.testing.assert_array_equal(
            np.asarray(getattr(full.params, name)),
            np.asarray(getattr(resumed.params, name)),
            err_msg=name,
        )


def test_refine_kill_and_resume_bit_exact(tmp_path):
    from sugar_tpu.refine.trainer import RefineConfig, refined_training

    _, _, cams, imgs = _tiny_scene()
    # Small double-pyramid mesh.
    verts = np.array(
        [[0, 0, 1], [1, 0, 0], [0, 1, 0], [-1, 0, 0], [0, -1, 0], [0, 0, -1]],
        np.float32,
    ) * 0.7
    faces = np.array(
        [[0, 1, 2], [0, 2, 3], [0, 3, 4], [0, 4, 1],
         [5, 2, 1], [5, 3, 2], [5, 4, 3], [5, 1, 4]],
        np.int64,
    )
    total, mid = 10, 5

    def run(iters, ckpt_dir=None, milestones=()):
        cfg = RefineConfig(
            num_iterations=iters, n_gaussians_per_triangle=1, sh_degree=0,
            sh_warmup_every=1, k_max=256, dup_capacity_mult=16,
            checkpoint_iterations=milestones,
        )
        return refined_training(
            verts, faces, None, cams, imgs, extent=2.0, cfg=cfg, seed=0,
            checkpoint_dir=ckpt_dir,
        )

    full, _ = run(total)
    ckpt_dir = str(tmp_path / "refine")
    run(mid, ckpt_dir=ckpt_dir, milestones=(mid,))
    resumed, _ = run(total, ckpt_dir=ckpt_dir, milestones=(mid,))

    for f in dataclasses.fields(type(full)):
        np.testing.assert_array_equal(
            np.asarray(getattr(full, f.name)),
            np.asarray(getattr(resumed, f.name)),
            err_msg=f.name,
        )
