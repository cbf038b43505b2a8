import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Texture extraction CLI (reference extract_refined_mesh_with_texture.py)."""

import argparse
import pickle

import jax.numpy as jnp
import numpy as np

from sugar_tpu.pipeline import PipelineConfig, load_scene
from sugar_tpu.refine import bound as B
from sugar_tpu.refine.extract_textured import TextureConfig, extract_textured_mesh

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--scene_path", required=True)
    p.add_argument("-m", "--refined_state", required=True, help="*_state.pkl from refinement")
    p.add_argument("-o", "--output_obj", required=True)
    p.add_argument("--square_size", type=int, default=10)
    p.add_argument("--postprocess_mesh", action="store_true")
    args = p.parse_args()

    with open(args.refined_state, "rb") as f:
        st = pickle.load(f)
    params = B.BoundParams(
        vertices=jnp.asarray(st["vertices"]),
        log_scales=jnp.asarray(st["log_scales"]),
        complex_rot=jnp.asarray(st["complex_rot"]),
        opacity_logit=jnp.asarray(st["opacity_logit"]),
        sh_dc=jnp.asarray(st["sh_dc"]),
        sh_rest=jnp.asarray(st["sh_rest"]),
    )
    _, bary = B.BARY_TABLES[st["n_per_triangle"]]
    bm = B.BoundMesh(
        faces=jnp.asarray(st["faces"].astype(np.int32)),
        bary=jnp.asarray(bary.astype(np.float32)),
        thickness=jnp.asarray(st["thickness"], jnp.float32),
        n_per_triangle=st["n_per_triangle"],
    )
    scene = load_scene(PipelineConfig(scene_path=args.scene_path))
    train_idx, _ = scene.split(True)
    sh_degree = int(round(np.sqrt(st["sh_rest"].shape[-1] + 1))) - 1
    out = extract_textured_mesh(
        params, bm, [scene.cameras[i] for i in train_idx], args.output_obj,
        TextureConfig(square_size=args.square_size, postprocess_mesh=args.postprocess_mesh),
        sh_degree=sh_degree,
    )
    print("textured mesh:", out)
