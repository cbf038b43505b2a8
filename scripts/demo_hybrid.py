"""Hybrid-representation walkthrough — the `view_sugar_results.ipynb`
equivalent (reference notebook: load a refined SuGaR model, render the
hybrid mesh+Gaussians representation, and compose an animated scene with
the compositor).

Given a refined state (written by refine stage checkpoints,
`<refined>.ply` + `<refined>_state.pkl`) and a scene directory for
cameras, this script:

1. loads the mesh-bound Gaussian state (refine.trainer.load_refined_state);
2. renders the hybrid representation from an orbit of cameras -> PNG frames;
3. runs the compositor demo: the scene plus a rigidly transformed copy of
   itself, rendered in ONE rasterizer call per frame while the copy spins
   (SuGaRCompositor analog, sugar_scene/sugar_compositor.py:12-245);
4. writes everything under --out.

Usage:
  python scripts/demo_hybrid.py --refined-ply out/refined.ply \
      --scene data/scene --out /tmp/hybrid_demo [--frames 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def orbit_cameras(center, radius, n, height=0.25, fov=0.9, res=256):
    from sugar_tpu.core.cameras import make_camera

    cams = []
    for i in range(n):
        th = 2 * np.pi * i / n
        fwd = -np.array([np.cos(th), height * np.sin(2 * th), np.sin(th)])
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        Rwc = np.stack([right, up2, fwd], 0)
        cam_center = np.asarray(center) - fwd * radius
        cams.append(
            make_camera(R=Rwc.T, T=-Rwc @ cam_center, fov_x=fov, fov_y=fov,
                        height=res, width=res)
        )
    return cams


def save_png(path, img):
    from PIL import Image

    arr = np.asarray(np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def run_demo(refined_ply: str, out_dir: str, n_frames: int = 8,
             resolution: int = 256, dup_capacity: int | None = None,
             k_max: int = 1024) -> dict:
    """Run the full walkthrough; returns paths of written artifacts."""
    import jax.numpy as jnp

    from sugar_tpu.models.compositor import GaussianSet, composite_render
    from sugar_tpu.refine import bound as B
    from sugar_tpu.refine.trainer import load_refined_state

    os.makedirs(out_dir, exist_ok=True)
    state_path = refined_ply.replace(".ply", "_state.pkl")
    params, bm = load_refined_state(state_path)

    ga = B.to_gaussian_arrays(params, bm)
    centers, scales, quats, opac = (
        ga["centers"], ga["scales"], ga["quaternions"], ga["opacities"]
    )
    # Viewer-style precomputed colors: SH DC term only.
    from sugar_tpu.core.sh import sh0_to_rgb

    colors = jnp.clip(sh0_to_rgb(ga["sh"][:, :, 0]), 0.0, 1.0)
    if dup_capacity is None:
        dup_capacity = max(16 * centers.shape[0], 2**15)

    c = np.asarray(jnp.mean(centers, axis=0))
    r = 2.8 * float(jnp.max(jnp.linalg.norm(centers - c[None], axis=-1)))
    cams = orbit_cameras(c, r, n_frames, res=resolution)

    base = GaussianSet(
        centers=centers, scales=scales, quaternions=quats,
        opacities=opac, colors=colors,
    )

    written = dict(hybrid=[], composite=[])
    # --- 1. hybrid render orbit.
    for i, cam in enumerate(cams):
        out = composite_render([base], cam, dup_capacity=dup_capacity,
                               k_max=k_max)
        p = os.path.join(out_dir, f"hybrid_{i:03d}.png")
        save_png(p, out["image"])
        written["hybrid"].append(p)

    # --- 2. compositor demo: scene + spinning, shifted copy of itself.
    offset = np.array([1.2 * r / 2.8, 0.0, 0.0], np.float32)
    for i, cam in enumerate(cams):
        th = 2 * np.pi * i / max(n_frames, 1)
        R = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
            np.float32,
        )
        copy = GaussianSet(
            centers=centers, scales=scales, quaternions=quats,
            opacities=opac, colors=colors,
            transform_R=jnp.asarray(R),
            transform_t=jnp.asarray(c + offset - R @ c),
        )
        out = composite_render([base, copy], cam, dup_capacity=2 * dup_capacity,
                               k_max=k_max)
        p = os.path.join(out_dir, f"composite_{i:03d}.png")
        save_png(p, out["image"])
        written["composite"].append(p)
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refined-ply", required=True,
                    help="refined .ply (with sibling _state.pkl)")
    ap.add_argument("--out", default="/tmp/hybrid_demo")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--k-max", type=int, default=1024)
    args = ap.parse_args()
    written = run_demo(args.refined_ply, args.out, n_frames=args.frames,
                       resolution=args.resolution, k_max=args.k_max)
    n = sum(len(v) for v in written.values())
    print(f"wrote {n} frames under {args.out}")


if __name__ == "__main__":
    main()
