import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Evaluation CLI — the reference's metrics.py protocol (PSNR/SSIM[/LPIPS]
on the every-8th-image test split)."""

import argparse
import json
import os

import jax.numpy as jnp
import numpy as np

from sugar_tpu.eval.metrics import evaluate_renders, write_metrics_json
from sugar_tpu.models import gaussians as gm
from sugar_tpu.models.render import render_model
from sugar_tpu.pipeline import PipelineConfig, load_scene

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--scene_path", required=True)
    p.add_argument("--checkpoint", required=True, help="gaussian PLY to evaluate")
    p.add_argument("--output", default="./output/metrics/results.json")
    p.add_argument("--lpips_weights", default=None)
    args = p.parse_args()

    scene = load_scene(PipelineConfig(scene_path=args.scene_path))
    model = gm.load_ply(args.checkpoint)
    _, test_idx = scene.split(True)

    def render_fn(i):
        return render_model(model, scene.cameras[i])["image"]

    results = evaluate_renders(render_fn, scene.images, test_idx, args.lpips_weights)
    scene_name = os.path.basename(os.path.normpath(args.scene_path))
    write_metrics_json(args.output, scene_name, results)
    print(json.dumps({scene_name: {k: v for k, v in results.items() if not k.startswith("per_")}}, indent=2))
