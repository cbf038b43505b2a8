"""Reduced quality-parity gate: stage-ordering invariants.

A micro version of scripts/run_parity.py (the stand-in for BASELINE.json
configs[1]-[4] in this dataset-less environment): procedural blob scene,
degraded init, vanilla -> coarse-SDF -> mesh -> refine through the public
pipeline API, PSNR on the every-8th held-out split. Asserts the stage
ORDERING invariants the reference protocol encodes (metrics.py:154-417):
vanilla must fit the scene, coarse must hold most of vanilla's quality
while regularizing, refine must recover (or beat) coarse from the
extracted mesh.
"""

import numpy as np
import pytest

from sugar_tpu.eval.parity import eval_gaussian_ply, make_parity_scene
from sugar_tpu.pipeline import (
    PipelineConfig,
    run_coarse,
    run_extract_mesh,
    run_refine,
    run_vanilla,
)


@pytest.mark.slow
def test_stage_ordering_invariants(tmp_path):
    v_it, c_it, r_it = 200, 150, 400
    scene, _ = make_parity_scene(
        n_gt=2_000, n_init=800, n_cams=16, resolution=96,
        render_mode="tiled", k_max=512,
    )
    train_idx, test_idx = scene.split(True)
    assert len(test_idx) == 2  # every-8th split of 16 cams

    cfg = PipelineConfig(
        scene_path="<procedural>",
        output_dir=str(tmp_path),
        regularization="sdf",
        poly="low_poly",
        eval_split=True,
        capacity=2**12,
        vanilla_iterations=v_it,
        resume=False,
        vanilla_overrides=dict(
            sh_degree=1, sh_warmup_every=max(1, v_it // 2),
            densify_from=50, densify_until=int(v_it * 0.8), densify_every=50,
            opacity_reset_every=10 * v_it, k_max=512, log_every=10**6,
            checkpoint_iterations=(),
        ),
        coarse_overrides=dict(
            start_iteration=v_it, num_iterations=v_it + c_it,
            entropy_start=v_it, entropy_end=v_it + c_it // 3,
            prune_at=(v_it + c_it // 3,), regularize_from=v_it,
            start_sdf_estimation_from=v_it + c_it // 3,
            n_samples_for_sdf_regularization=20_000,
            reset_neighbors_every=50, sh_degree=1, k_max=512,
            log_every=10**6, checkpoint_iterations=(),
        ),
        extract_overrides=dict(
            surface_level=0.3, prune_opacity_threshold=0.5,
            total_points=150_000, poisson_resolution=96,
            decimation_target=6_000, dup_capacity=2**16, k_max=512,
        ),
        refine_overrides=dict(
            num_iterations=r_it, n_gaussians_per_triangle=3, sh_degree=1,
            sh_warmup_every=max(1, r_it // 4), k_max=512, log_every=10**6,
            checkpoint_iterations=(),
        ),
    )

    def psnr(ply):
        return eval_gaussian_ply(ply, scene, test_idx, render_mode="tiled",
                                 k_max=512)["psnr"]

    gs_ply = run_vanilla(cfg, scene, log_fn=lambda *_: None)
    p_vanilla = psnr(gs_ply)
    coarse_ply = run_coarse(cfg, scene, gs_ply, log_fn=lambda *_: None)
    p_coarse = psnr(coarse_ply)
    mesh_ply = run_extract_mesh(cfg, scene, coarse_ply, log_fn=lambda *_: None)
    from sugar_tpu.io.ply import load_mesh_ply

    verts, faces, _ = load_mesh_ply(mesh_ply)
    refined_ply = run_refine(cfg, scene, mesh_ply, log_fn=lambda *_: None)
    p_refined = psnr(refined_ply)

    # Absolute per-stage thresholds pinned ~1.5 dB under the committed r5
    # numbers of this exact config (CPU, fixed seeds: vanilla 17.00,
    # coarse 19.10, refined 16.94 — see the PARITY protocol /
    # PARITY_r05.json for the full-scale TPU run). A >= 1.5 dB stage
    # regression now fails the gate (VERDICT r4 #8: the old +-4 dB bands
    # would have passed a 3.9 dB loss).
    assert p_vanilla > 15.5, p_vanilla
    assert p_coarse > 17.6, (p_vanilla, p_coarse)
    assert len(verts) > 500 and len(faces) > 500
    assert p_refined > 15.4, (p_coarse, p_refined)
    # Ordering invariants on top of the absolute floors.
    assert p_coarse > p_vanilla - 1.0, (p_vanilla, p_coarse)
    assert p_refined > p_coarse - 3.0, (p_coarse, p_refined)
    # Surface sanity: mesh vertices near the blob radius band.
    r = np.linalg.norm(verts, axis=1)
    assert 0.3 < float(np.median(r)) < 1.6, float(np.median(r))
