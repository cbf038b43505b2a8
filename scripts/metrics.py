import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Evaluation CLI — the reference's metrics.py protocol (PSNR/SSIM[/LPIPS]
on the every-8th-image test split) over all three evaluated objects:

- ``--checkpoint``     gaussian PLY (vanilla / coarse / refined-exported)
- ``--refined_state``  refined hybrid ``_state.pkl`` (bound Gaussians
                       rendered via to_gaussian_arrays; reference
                       metrics.py:283-292)
- ``--textured_obj``   UV-textured OBJ render (mesh rasterizer + texel
                       lookup; reference metrics.py:292-300 via
                       MeshRasterizer + TexturesUV)

Each given object adds one row to the output JSON.
"""

import argparse
import json
import os

import numpy as np

from sugar_tpu.eval.metrics import evaluate_renders, write_metrics_json
from sugar_tpu.models import gaussians as gm
from sugar_tpu.models.render import render_model
from sugar_tpu.pipeline import PipelineConfig, load_scene

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--scene_path", required=True)
    p.add_argument("--checkpoint", default=None, help="gaussian PLY to evaluate")
    p.add_argument("--refined_state", default=None, help="refined _state.pkl")
    p.add_argument("--textured_obj", default=None, help="textured mesh OBJ")
    p.add_argument("--output", default="./output/metrics/results.json")
    p.add_argument("--lpips_weights", default=None)
    p.add_argument(
        "--white_background", action="store_true",
        help="render refined state over a white background (match scenes "
        "trained with white_background, e.g. NeRF-synthetic)",
    )
    args = p.parse_args()
    if not (args.checkpoint or args.refined_state or args.textured_obj):
        p.error("give at least one of --checkpoint / --refined_state / --textured_obj")

    scene = load_scene(PipelineConfig(scene_path=args.scene_path))
    _, test_idx = scene.split(True)
    results = {}

    if args.checkpoint:
        from sugar_tpu.eval.parity import _adaptive_renderer
        from sugar_tpu.raster import adaptive

        model = gm.load_ply(args.checkpoint)
        render = _adaptive_renderer(
            model, "auto",
            adaptive.RasterCaps(
                tile_cap=16, dup_capacity=8 * model.capacity, k_max=1024
            ),
        )

        def render_fn(i):
            return render(scene.cameras[i])["image"]

        results["gaussians"] = evaluate_renders(
            render_fn, scene.images, test_idx, args.lpips_weights
        )

    if args.refined_state:
        import jax.numpy as jnp

        from sugar_tpu.refine.trainer import load_refined_state, render_bound

        params, bm = load_refined_state(args.refined_state)
        sh_degree = int(round(np.sqrt(params.sh_rest.shape[-1] + 1))) - 1
        bg = jnp.full((3,), 1.0 if args.white_background else 0.0, jnp.float32)
        # Adaptive no-clipping protocol (eval/parity): start from
        # model-sized caps and grow until every overflow counter is zero,
        # so metrics can never understate quality to silent clipping.
        import functools

        import jax

        from sugar_tpu.raster import adaptive

        n_bound = int(params.opacity_logit.shape[0])
        caps_box = {
            "caps": adaptive.RasterCaps(
                tile_cap=16, dup_capacity=max(2**21, 8 * n_bound), k_max=1024
            )
        }
        jits = {}

        def render_refined(i):
            for _ in range(8):
                c = caps_box["caps"]
                key = (c.tile_cap, c.dup_capacity, c.k_max, c.cap_a, c.big_cap)
                if key not in jits:
                    jits[key] = jax.jit(
                        functools.partial(
                            render_bound, active_sh_degree=sh_degree, bg=bg,
                            dup_capacity=c.dup_capacity, k_max=c.k_max,
                            tile_cap=c.tile_cap, cap_a=c.cap_a,
                            big_cap=c.big_cap,
                        )
                    )
                out = jits[key](params, bm, scene.cameras[i])
                ovf = adaptive.read_overflow(out)
                if not adaptive.overflowed(ovf):
                    return out["image"]
                caps_box["caps"] = c.grown(ovf)
            raise RuntimeError(f"capacity growth did not converge: {ovf}")

        results["refined"] = evaluate_renders(
            render_refined, scene.images, test_idx, args.lpips_weights
        )

    if args.textured_obj:
        from PIL import Image

        from sugar_tpu.io.obj import load_obj
        from sugar_tpu.refine.texture import render_textured_mesh

        verts, faces, uvs, fuv = load_obj(args.textured_obj)
        if uvs is None or fuv is None:
            raise SystemExit(f"{args.textured_obj} has no UVs")
        # save_obj writes vt = (v, 1 - u) for atlas coords (u=row, v=col);
        # invert to recover the atlas layout render_textured_mesh expects.
        vt = uvs[fuv]  # (F, 3, 2) OBJ-convention
        verts_uv = np.stack([1.0 - vt[..., 1], vt[..., 0]], axis=-1)
        png = os.path.splitext(args.textured_obj)[0] + ".png"
        texture = np.asarray(Image.open(png)).astype(np.float32)[..., :3] / 255.0

        def render_textured(i):
            return render_textured_mesh(
                verts, faces, verts_uv, texture, scene.cameras[i]
            )

        results["textured"] = evaluate_renders(
            render_textured, scene.images, test_idx, args.lpips_weights
        )

    scene_name = os.path.basename(os.path.normpath(args.scene_path))
    write_metrics_json(args.output, scene_name, results)
    print(
        json.dumps(
            {
                scene_name: {
                    obj: {k: v for k, v in r.items() if not k.startswith("per_")}
                    for obj, r in results.items()
                }
            },
            indent=2,
        )
    )
