import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Full pipeline CLI — the reference's train.py (:17-108) argument surface."""

import argparse

from sugar_tpu.pipeline import PipelineConfig, run_full_pipeline

if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Train SuGaR-TPU end to end.")
    p.add_argument("-s", "--scene_path", required=True)
    p.add_argument("-o", "--output_dir", default="./output")
    p.add_argument("-r", "--regularization_type", default="sdf",
                   choices=["sdf", "density"])
    p.add_argument("--low_poly", action="store_true",
                   help="200k mesh vertices, 6 gaussians/triangle")
    p.add_argument("--high_poly", action="store_true",
                   help="1M mesh vertices, 1 gaussian/triangle (default)")
    p.add_argument("--refinement_time", default="long",
                   choices=["short", "medium", "long"])
    p.add_argument("-l", "--surface_level", type=float, default=0.3)
    p.add_argument("--eval", action="store_true", default=True)
    p.add_argument("--white_background", action="store_true")
    p.add_argument("--resolution", type=int, default=1)
    p.add_argument("--devices", type=int, default=1,
                   help="run training/meshing stages sharded over the first "
                        "N jax devices (a ('data','gauss') mesh); 1 = "
                        "single-device (reference train.py behavior)")
    p.add_argument("--mesh_gauss", type=int, default=None,
                   help="'gauss' axis size of the device mesh (default: 2 "
                        "if --devices is even else 1)")
    args = p.parse_args()

    cfg = PipelineConfig(
        scene_path=args.scene_path,
        output_dir=args.output_dir,
        regularization=args.regularization_type,
        poly="low_poly" if args.low_poly else "high_poly",
        refinement_time=args.refinement_time,
        surface_level=args.surface_level,
        eval_split=args.eval,
        white_background=args.white_background,
        resolution_factor=args.resolution,
        devices=args.devices,
        mesh_gauss=args.mesh_gauss,
    )
    artifacts = run_full_pipeline(cfg)
    print("Artifacts:", artifacts)
