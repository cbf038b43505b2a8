"""Export LPIPS-VGG weights to the npz layout sugar_tpu.eval.metrics expects.

Run this on a machine WITH network access / torchvision installed:

    python scripts/export_lpips_weights.py lpips_vgg.npz

then pass the file via ``lpips_weights=`` to evaluate_renders (or the
--lpips_weights flag of scripts/metrics.py). This environment has no
egress, so the conversion cannot run here — LPIPS simply stays disabled
without the file (PSNR/SSIM are always reported).

Calibrated heads require the ``lpips`` package (richzhang/
PerceptualSimilarity). Without it this script REFUSES to write anything
unless --allow-uncalibrated is passed, in which case the output filename
is forced to carry an ``.uncalibrated.npz`` suffix so downstream metrics
can never silently report placeholder numbers as LPIPS.

Layout (matches eval/metrics.make_lpips):
  features.N.weight / features.N.bias  — torchvision VGG16 conv params
  lin0..lin4                           — LPIPS linear head weights (C_k,)
  calibrated                           — scalar 1/0 flag
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(out_path: str, allow_uncalibrated: bool = False) -> None:
    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
    out = {}
    for name, p in vgg.state_dict().items():
        out[f"features.{name}"] = p.numpy()

    # LPIPS linear heads from the official release (richzhang/PerceptualSimilarity).
    try:
        import lpips as lpips_pkg

        net = lpips_pkg.LPIPS(net="vgg")
        for k in range(5):
            lin = getattr(net, f"lin{k}").model[-1].weight.data  # (1, C, 1, 1)
            out[f"lin{k}"] = lin.squeeze().numpy()
        out["calibrated"] = np.asarray(1, np.int32)
    except ImportError:
        if not allow_uncalibrated:
            raise SystemExit(
                "lpips package not installed: refusing to write placeholder "
                "heads. pip install lpips for the calibrated ones, or pass "
                "--allow-uncalibrated to write uniform heads into a "
                "*.uncalibrated.npz file (NOT valid for reporting LPIPS)."
            )
        if not out_path.endswith(".uncalibrated.npz"):
            out_path = out_path.removesuffix(".npz") + ".uncalibrated.npz"
        print(
            f"lpips package not installed; writing UNIFORM placeholder heads "
            f"to {out_path} — numbers computed with this file are NOT LPIPS",
            file=sys.stderr,
        )
        for k, c in enumerate([64, 128, 256, 512, 512]):
            out[f"lin{k}"] = np.full((c,), 1.0 / c, np.float32)
        out["calibrated"] = np.asarray(0, np.int32)

    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("out_path", nargs="?", default="lpips_vgg.npz")
    p.add_argument(
        "--allow-uncalibrated", action="store_true",
        help="permit writing uniform placeholder heads (renamed to "
        "*.uncalibrated.npz; metrics will refuse to label them lpips)",
    )
    a = p.parse_args()
    main(a.out_path, a.allow_uncalibrated)
