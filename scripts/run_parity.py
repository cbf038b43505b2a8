"""Run the full-pipeline quality-parity gate and write PARITY_r03.json.

Protocol: sugar_tpu.eval.parity — procedural GT scene (60k surface
Gaussians, 80 cameras at 256x256), degraded init, every-8th eval split,
vanilla -> coarse-SDF -> mesh -> refine with per-stage PSNR/SSIM on the
held-out cameras (reference protocol: metrics.py:154-417 with the
gs_model.py:133-143 split). Runs on whatever backend JAX provides (the
real TPU under axon; CPU works but is slow).

Usage: python scripts/run_parity.py [--out PARITY_r03.json] [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sugar_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_r03.json")
    ap.add_argument("--workdir", default="/tmp/sugar_parity")
    ap.add_argument("--small", action="store_true", help="tiny smoke config")
    args = ap.parse_args()

    from sugar_tpu.eval.parity import eval_gaussian_ply, make_parity_scene
    from sugar_tpu.pipeline import (
        PipelineConfig,
        run_coarse,
        run_extract_mesh,
        run_refine,
        run_vanilla,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    mode = "pallas" if on_tpu else "tiled"

    if args.small:
        scfg = dict(n_gt=4_000, n_init=1_500, n_cams=16, resolution=128)
        vanilla_iters, coarse_iters, refine_iters = 300, 300, 200
        capacity = 2**13
        extract_over = dict(
            total_points=400_000, poisson_resolution=96,
            decimation_target=8_000, dup_capacity=2**17,
        )
    else:
        scfg = dict(n_gt=60_000, n_init=15_000, n_cams=80, resolution=256)
        # r5 budget: the full 3000/2500/1500 schedule exceeded the round's
        # wall-clock twice (one tunnel hang); same scene + protocol with a
        # tighter coarse/refine budget still pins absolute per-stage PSNRs.
        vanilla_iters, coarse_iters, refine_iters = 3_000, 1_200, 7_000
        capacity = 2**17
        extract_over = dict(
            total_points=2_000_000, poisson_resolution=160,
            decimation_target=50_000, dup_capacity=2**20,
        )

    t0 = time.time()
    print(f"backend={jax.default_backend()} mode={mode}", flush=True)
    scene, _target = make_parity_scene(
        **scfg, render_mode=mode, dup_capacity=None, k_max=1024
    )
    train_idx, test_idx = scene.split(True)
    print(f"scene ready ({time.time() - t0:.0f}s): "
          f"{len(train_idx)} train / {len(test_idx)} test", flush=True)

    c_end = vanilla_iters + coarse_iters
    cfg = PipelineConfig(
        scene_path="<procedural>",
        output_dir=args.workdir,
        resume=True,  # completed stages skip on relaunch (artifacts on disk)
        regularization="sdf",
        poly="low_poly",
        eval_split=True,
        capacity=capacity,
        vanilla_iterations=vanilla_iters,
        vanilla_overrides=dict(
            sh_degree=1,
            sh_warmup_every=max(1, vanilla_iters // 3),
            densify_from=500,
            densify_until=int(vanilla_iters * 0.85),
            densify_every=100,
            opacity_reset_every=10 * vanilla_iters,  # off: short schedule
            k_max=1024,
            log_every=max(1, vanilla_iters // 10),
            checkpoint_iterations=(),
        ),
        coarse_overrides=dict(
            start_iteration=vanilla_iters,
            num_iterations=c_end,
            entropy_start=vanilla_iters,
            entropy_end=vanilla_iters + int(coarse_iters * 0.3),
            prune_at=(vanilla_iters + int(coarse_iters * 0.3),),
            regularize_from=vanilla_iters,
            start_sdf_estimation_from=vanilla_iters + int(coarse_iters * 0.3),
            n_samples_for_sdf_regularization=150_000,
            reset_neighbors_every=150,
            sh_degree=1,
            k_max=1024,
            log_every=max(1, coarse_iters // 10),
            checkpoint_iterations=(),
        ),
        extract_overrides=dict(
            surface_level=0.3, prune_opacity_threshold=0.5,
            k_max=1024, **extract_over,
        ),
        refine_overrides=dict(
            num_iterations=refine_iters,
            # 3/tri: a decimated 50k-vertex mesh at 1/tri has ~1/3 the
            # appearance capacity of the coarse model; 3/tri recovers it
            # (the reference's low_poly preset binds 6/tri, train.py:92-99).
            n_gaussians_per_triangle=3,
            sh_degree=1,
            sh_warmup_every=max(1, refine_iters // 2),
            k_max=1024,
            log_every=max(1, refine_iters // 10),
            checkpoint_iterations=(),
        ),
    )

    os.makedirs(args.workdir, exist_ok=True)
    results: dict = dict(
        protocol="sugar_tpu.eval.parity procedural blob; every-8th split "
        "(reference metrics.py:154-417, gs_model.py:133-143)",
        backend=jax.default_backend(),
        scene=scfg,
        iterations=dict(
            vanilla=vanilla_iters, coarse=coarse_iters, refine=refine_iters
        ),
        stages={},
    )

    def log(d):
        print(d if isinstance(d, str) else json.dumps(d), flush=True)

    def stage_eval(name, ply):
        r = eval_gaussian_ply(ply, scene, test_idx, render_mode=mode, k_max=1024)
        r.pop("per_image_psnr", None)
        r.pop("per_image_ssim", None)
        results["stages"][name] = r
        print(f"[{name}] PSNR={r['psnr']:.2f} SSIM={r['ssim']:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    gs_ply = run_vanilla(cfg, scene, log_fn=log)
    stage_eval("vanilla", gs_ply)

    coarse_ply = run_coarse(cfg, scene, gs_ply, log_fn=log)
    stage_eval("coarse_sdf", coarse_ply)

    mesh_ply = run_extract_mesh(cfg, scene, coarse_ply, log_fn=log)
    from sugar_tpu.io import ply as ply_io

    verts, faces, _cols = ply_io.load_mesh_ply(mesh_ply)
    results["stages"]["mesh"] = dict(
        vertices=int(len(verts)), faces=int(len(faces))
    )
    print(f"[mesh] {len(verts)} verts / {len(faces)} faces "
          f"({time.time() - t0:.0f}s)", flush=True)

    refined_ply = run_refine(cfg, scene, mesh_ply, log_fn=log)
    stage_eval("refined", refined_ply)

    results["wall_s"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["stages"], indent=2))
    print(f"wrote {args.out} in {results['wall_s']}s")


if __name__ == "__main__":
    main()
