import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Refinement CLI (reference train_refined.py surface)."""

import argparse

from sugar_tpu.pipeline import PipelineConfig, load_scene, run_refine

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--scene_path", required=True)
    p.add_argument("-m", "--mesh_path", required=True)
    p.add_argument("-o", "--output_dir", default="./output")
    p.add_argument("-g", "--gaussians_per_triangle", type=int, default=1, choices=[1, 3, 4, 6])
    p.add_argument("-f", "--refinement_iterations", type=int, default=15_000)
    p.add_argument("--white_background", action="store_true")
    args = p.parse_args()
    time_name = {2000: "short", 7000: "medium", 15000: "long"}.get(
        args.refinement_iterations, "long"
    )
    cfg = PipelineConfig(
        scene_path=args.scene_path,
        output_dir=args.output_dir,
        poly="low_poly" if args.gaussians_per_triangle == 6 else "high_poly",
        refinement_time=time_name,
        white_background=args.white_background,
        refine_overrides=dict(num_iterations=args.refinement_iterations,
                              n_gaussians_per_triangle=args.gaussians_per_triangle),
    )
    print("refined:", run_refine(cfg, load_scene(cfg), args.mesh_path))
