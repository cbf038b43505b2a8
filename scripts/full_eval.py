import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Benchmark-suite orchestration (gaussian_splatting/full_eval.py:15-74):
runs train+render+metrics over the standard scene sets when their data dirs
exist under --base_dir (mipnerf360: 9 scenes, tanksandtemples: 2,
deepblending: 2)."""

import argparse
import json
import os
import subprocess
import sys

MIPNERF360_OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
MIPNERF360_INDOOR = ["room", "counter", "kitchen", "bonsai"]
TANKS_AND_TEMPLES = ["truck", "train"]
DEEP_BLENDING = ["drjohnson", "playroom"]

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--output_dir", default="./output/full_eval")
    p.add_argument("--skip_training", action="store_true")
    p.add_argument("--skip_metrics", action="store_true")
    args = p.parse_args()

    scenes = MIPNERF360_OUTDOOR + MIPNERF360_INDOOR + TANKS_AND_TEMPLES + DEEP_BLENDING
    results = {}
    for scene in scenes:
        spath = os.path.join(args.base_dir, scene)
        if not os.path.isdir(spath):
            print(f"skip {scene}: not found")
            continue
        out = os.path.join(args.output_dir, scene)
        if not args.skip_training:
            subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "train_full_pipeline.py"),
                 "-s", spath, "-o", out, "-r", "sdf"],
                check=True,
            )
        if not args.skip_metrics:
            ckpt = os.path.join(out, "coarse", "coarse_15000.ply")
            subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "metrics.py"),
                 "--scene_path", spath, "--checkpoint", ckpt,
                 "--output", os.path.join(args.output_dir, "metrics.json")],
                check=True,
            )
    print(json.dumps(results, indent=2))
