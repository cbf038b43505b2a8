import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Animated scene composition: Blender-exported trajectory + per-frame
rigid transforms -> composited rendered frames.

The TPU equivalent of the reference's sugar_compositor flow
(sugar_scene/sugar_compositor.py:12-245 + blender/*.py exports): each
gaussian PLY becomes one composited component; frame f applies
transforms[f][k] to component k, renders every component through ONE
rasterizer call (correct cross-model occlusion), and writes PNG frames.

Usage:
  python scripts/compose_animation.py \
      --ply scene.ply --ply character.ply \
      --trajectory camera_traj.json [--animation anims.json] \
      --height 512 --width 512 -o ./frames
"""

import argparse
import os

import numpy as np

from sugar_tpu.io.blender_interop import (
    load_animation_transforms,
    load_camera_trajectory,
)
from sugar_tpu.models.compositor import GaussianSet, composite_render
from sugar_tpu.models import gaussians as gm
from sugar_tpu.core import sh as sh_lib


def set_from_ply(path: str) -> GaussianSet:
    import jax.numpy as jnp

    model = gm.load_ply(path)
    rgb = jnp.clip(sh_lib.sh0_to_rgb(model.params.sh_dc), 0.0, 1.0)
    return GaussianSet(
        centers=model.params.xyz,
        scales=model.scales,
        quaternions=model.quaternions,
        opacities=model.opacities,
        colors=rgb,
        mask=model.alive,
    )


def main() -> None:
    import dataclasses

    import jax.numpy as jnp
    from PIL import Image

    p = argparse.ArgumentParser()
    p.add_argument("--ply", action="append", required=True,
                   help="gaussian PLY; repeat for multiple components")
    p.add_argument("--trajectory", required=True,
                   help="Blender camera-trajectory JSON")
    p.add_argument("--animation", default=None,
                   help="per-frame rigid-transform JSON (frames x components)")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("-o", "--output_dir", default="./frames")
    p.add_argument("--k_max", type=int, default=1024)
    args = p.parse_args()

    base_sets = [set_from_ply(path) for path in args.ply]
    cams = load_camera_trajectory(args.trajectory, args.height, args.width)
    anims = load_animation_transforms(args.animation) if args.animation else None
    if anims is not None:
        # Validate up front: a short frame entry would otherwise raise
        # IndexError mid-render, after frames were already written.
        for f, tr in enumerate(anims):
            if len(tr) != len(base_sets):
                raise SystemExit(
                    f"animation frame {f} has {len(tr)} transforms but "
                    f"{len(base_sets)} --ply components were given"
                )
    os.makedirs(args.output_dir, exist_ok=True)

    for f, cam in enumerate(cams):
        sets = base_sets
        if anims is not None:
            tr = anims[min(f, len(anims) - 1)]
            sets = [
                dataclasses.replace(
                    s,
                    transform_R=jnp.asarray(tr[k]["R"]),
                    transform_t=jnp.asarray(tr[k]["t"]),
                )
                for k, s in enumerate(base_sets)
            ]
        out = composite_render(sets, cam, k_max=args.k_max)
        img = np.clip(np.asarray(out["image"]), 0.0, 1.0)
        path = os.path.join(args.output_dir, f"frame_{f:05d}.png")
        Image.fromarray((img * 255).astype(np.uint8)).save(path)
        print(path, flush=True)


if __name__ == "__main__":
    main()
