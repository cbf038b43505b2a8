import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Offline render of train/test splits (gaussian_splatting/render.py
equivalent): writes renders/ and gt/ directories per split."""

import argparse
import os

import numpy as np

from sugar_tpu.models import gaussians as gm
from sugar_tpu.models.render import render_model
from sugar_tpu.pipeline import PipelineConfig, load_scene


def _save(path, arr):
    from PIL import Image

    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--scene_path", required=True)
    p.add_argument("-c", "--checkpoint", required=True)
    p.add_argument("-o", "--output_dir", default="./output/renders")
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    args = p.parse_args()

    scene = load_scene(PipelineConfig(scene_path=args.scene_path))
    model = gm.load_ply(args.checkpoint)
    train_idx, test_idx = scene.split(True)
    jobs = []
    if not args.skip_train:
        jobs.append(("train", train_idx))
    if not args.skip_test:
        jobs.append(("test", test_idx))
    for split, indices in jobs:
        rdir = os.path.join(args.output_dir, split, "renders")
        gdir = os.path.join(args.output_dir, split, "gt")
        os.makedirs(rdir, exist_ok=True)
        os.makedirs(gdir, exist_ok=True)
        for k, i in enumerate(indices):
            img = np.asarray(render_model(model, scene.cameras[i])["image"])
            _save(os.path.join(rdir, f"{k:05d}.png"), img)
            _save(os.path.join(gdir, f"{k:05d}.png"), scene.images[i])
        print(f"{split}: {len(indices)} images -> {rdir}")
