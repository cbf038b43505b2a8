import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Coarse mesh extraction CLI (reference extract_mesh.py surface)."""

import argparse

from sugar_tpu.pipeline import PipelineConfig, load_scene, run_extract_mesh

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--scene_path", required=True)
    p.add_argument("-c", "--coarse_model_path", required=True)
    p.add_argument("-o", "--output_dir", default="./output")
    p.add_argument("-l", "--surface_level", type=float, default=0.3)
    p.add_argument("-d", "--decimation_target", type=int, default=1_000_000)
    args = p.parse_args()
    cfg = PipelineConfig(
        scene_path=args.scene_path,
        output_dir=args.output_dir,
        surface_level=args.surface_level,
    )
    scene = load_scene(cfg)
    print("mesh:", run_extract_mesh(cfg, scene, args.coarse_model_path))
