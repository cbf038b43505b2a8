"""Integration: full 4-stage pipeline on a tiny synthetic Blender scene.

The end-to-end gate (BASELINE.json configs flavor at toy scale): build a
NeRF-synthetic-style scene directory on disk, then run vanilla -> coarse ->
mesh -> refine entirely through the public pipeline API, checking every
artifact exists and loads.
"""

import json
import os

import numpy as np
import pytest

from sugar_tpu.pipeline import (
    PipelineConfig,
    load_scene,
    run_coarse,
    run_extract_mesh,
    run_refine,
    run_vanilla,
)


@pytest.fixture(scope="module")
def toy_blender_scene(tmp_path_factory):
    """Write a tiny transforms_train.json scene: views of a textured sphere
    rendered from a known gaussian model."""
    root = tmp_path_factory.mktemp("scene")
    import jax.numpy as jnp

    from sugar_tpu.core.cameras import make_camera
    from sugar_tpu.models.gaussians import create_from_pcd
    from sugar_tpu.models.render import render_model
    from PIL import Image

    g = np.random.default_rng(0)
    d = g.normal(size=(200, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = (0.7 * d).astype(np.float32)
    cols = (0.4 + 0.6 * np.abs(d)).astype(np.float32)
    target = create_from_pcd(pts, cols, capacity=256, sh_degree=0, initial_opacity=0.95)

    frames = []
    n_cams = 8
    (root / "train").mkdir()
    for i in range(n_cams):
        th = 2 * np.pi * i / n_cams
        fwd = -np.array([np.cos(th), 0.3 * np.sin(2 * th), np.sin(th)])
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        Rwc = np.stack([right, up2, fwd], 0)
        center = -fwd * 2.5
        T = -Rwc @ center
        cam = make_camera(R=Rwc.T, T=T, fov_x=0.8, fov_y=0.8, height=48, width=48)
        img = np.asarray(
            jnp.clip(render_model(target, cam, dup_capacity=8192, k_max=256)["image"], 0, 1)
        )
        Image.fromarray((img * 255).astype(np.uint8)).save(str(root / "train" / f"r_{i}.png"))
        # transform_matrix: COLMAP W2C -> invert -> OpenGL convention flip.
        w2c = np.asarray(cam.world_view)
        c2w = np.linalg.inv(w2c)
        c2w[:3, 1:3] *= -1  # back to Blender axes
        frames.append(
            dict(file_path=f"train/r_{i}", transform_matrix=c2w.tolist())
        )
    with open(root / "transforms_train.json", "w") as f:
        json.dump(dict(camera_angle_x=0.8, frames=frames), f)
    return str(root)


@pytest.mark.slow
def test_full_pipeline_toy(toy_blender_scene, tmp_path):
    cfg = PipelineConfig(
        scene_path=toy_blender_scene,
        output_dir=str(tmp_path / "out"),
        poly="low_poly",
        refinement_time="short",
        eval_split=False,
        white_background=True,
        capacity=512,
        vanilla_iterations=60,
        vanilla_overrides=dict(
            sh_degree=0, sh_warmup_every=1, densify_from=10_000,
            densify_until=10_000, opacity_reset_every=10_000,
            dup_capacity_mult=32, k_max=256, log_every=30,
        ),
        coarse_overrides=dict(
            start_iteration=0, num_iterations=40, entropy_start=5,
            entropy_end=20, start_sdf_estimation_from=20, regularize_from=10,
            prune_at=(), sh_degree=0, reset_neighbors_every=10,
            n_samples_for_sdf_regularization=20_000, k_max=256,
            dup_capacity_mult=32, log_every=10,
        ),
        extract_overrides=dict(
            total_points=60_000, poisson_resolution=64, decimation_target=2_000,
            dup_capacity=2**14, k_max=256, prune_opacity_threshold=0.1,
        ),
        refine_overrides=dict(
            num_iterations=20, sh_degree=0, sh_warmup_every=1, k_max=256,
            dup_capacity_mult=16, log_every=10,
        ),
    )
    scene = load_scene(cfg)
    # Replace random init points with points near the target sphere so the
    # toy vanilla stage converges quickly.
    g = np.random.default_rng(1)
    d = g.normal(size=(200, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    scene.points = (0.7 * d + 0.05 * g.normal(size=(200, 3))).astype(np.float32)
    scene.colors = np.full((200, 3), 0.5, np.float32)

    logs = []
    gs = run_vanilla(cfg, scene, log_fn=logs.append)
    assert os.path.exists(gs)
    coarse = run_coarse(cfg, scene, gs, log_fn=logs.append)
    assert os.path.exists(coarse)
    mesh = run_extract_mesh(cfg, scene, coarse, log_fn=logs.append)
    assert os.path.exists(mesh)
    from sugar_tpu.io.ply import load_mesh_ply

    v, f, _ = load_mesh_ply(mesh)
    assert len(v) > 100 and len(f) > 100, (len(v), len(f))
    refined = run_refine(cfg, scene, mesh, log_fn=logs.append)
    assert os.path.exists(refined)
    assert os.path.exists(refined.replace(".ply", "_state.pkl"))
    from sugar_tpu.pipeline import run_texture

    textured = run_texture(cfg, scene, refined, log_fn=logs.append)
    assert os.path.exists(textured)
    assert os.path.exists(textured.replace(".obj", ".png"))
    # Refined PLY loads as a gaussian model.
    from sugar_tpu.io.ply import load_gaussian_ply

    d2 = load_gaussian_ply(refined)
    assert d2["xyz"].shape[0] == 6 * len(f)  # low_poly: 6 gaussians/triangle

    # Hybrid walkthrough (the view_sugar_results.ipynb equivalent) runs on
    # the refined artifacts: orbit renders + two-scene compositor frames.
    sys_path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    import sys

    sys.path.insert(0, sys_path)
    try:
        from demo_hybrid import run_demo
    finally:
        sys.path.remove(sys_path)
    written = run_demo(refined, str(tmp_path / "demo"), n_frames=2,
                       resolution=64, k_max=256)
    for paths in written.values():
        for p in paths:
            assert os.path.exists(p) and os.path.getsize(p) > 0


@pytest.mark.slow
def test_full_pipeline_toy_multichip(toy_blender_scene, tmp_path):
    """End-to-end pipeline with --devices 8: every training/meshing stage
    routes through the sharded parallel/ components on the virtual CPU mesh
    and produces the same artifact formats (VERDICT r4 #6)."""
    cfg = PipelineConfig(
        scene_path=toy_blender_scene,
        output_dir=str(tmp_path / "out8"),
        poly="low_poly",
        refinement_time="short",
        eval_split=False,
        white_background=True,
        capacity=512,
        devices=8,
        vanilla_iterations=64,
        vanilla_overrides=dict(
            sh_degree=0, sh_warmup_every=1, densify_from=10_000,
            densify_until=10_000, opacity_reset_every=10_000,
            dup_capacity_mult=32, k_max=256, log_every=32,
        ),
        coarse_overrides=dict(
            start_iteration=0, num_iterations=40, entropy_start=5,
            entropy_end=20, start_sdf_estimation_from=20, regularize_from=10,
            prune_at=(), sh_degree=0, reset_neighbors_every=12,
            n_samples_for_sdf_regularization=20_000, k_max=256,
            dup_capacity_mult=32, log_every=12, render_mode="tiled",
        ),
        extract_overrides=dict(
            total_points=60_000, poisson_resolution=64, decimation_target=2_000,
            dup_capacity=2**14, k_max=256, prune_opacity_threshold=0.1,
        ),
        refine_overrides=dict(
            num_iterations=24, sh_degree=0, sh_warmup_every=1, k_max=256,
            dup_capacity_mult=16, log_every=12, render_mode="tiled",
        ),
    )
    scene = load_scene(cfg)
    g = np.random.default_rng(1)
    d = g.normal(size=(200, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    scene.points = (0.7 * d + 0.05 * g.normal(size=(200, 3))).astype(np.float32)
    scene.colors = np.full((200, 3), 0.5, np.float32)

    logs = []
    gs = run_vanilla(cfg, scene, log_fn=logs.append)
    assert os.path.exists(gs)
    coarse = run_coarse(cfg, scene, gs, log_fn=logs.append)
    assert os.path.exists(coarse)
    mesh = run_extract_mesh(cfg, scene, coarse, log_fn=logs.append)
    from sugar_tpu.io.ply import load_mesh_ply

    v, f, vc = load_mesh_ply(mesh)
    assert len(v) > 100 and len(f) > 100, (len(v), len(f))
    assert vc is not None  # vertex colors survive the sharded meshing path
    refined = run_refine(cfg, scene, mesh, log_fn=logs.append)
    assert os.path.exists(refined)
    from sugar_tpu.io.ply import load_gaussian_ply

    d2 = load_gaussian_ply(refined)
    assert d2["xyz"].shape[0] == 6 * len(f)
    # The sharded loops logged their mesh shape.
    assert any("mesh" in str(l) for l in logs)
