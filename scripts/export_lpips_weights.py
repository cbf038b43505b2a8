"""Export LPIPS-VGG weights to the npz layout sugar_tpu.eval.metrics expects.

Run this on a machine WITH network access / torchvision installed:

    python scripts/export_lpips_weights.py lpips_vgg.npz

then pass the file via ``lpips_weights=`` to evaluate_renders (or the
--lpips_weights flag of scripts/metrics.py). This environment has no
egress, so the conversion cannot run here — LPIPS simply stays disabled
without the file (PSNR/SSIM are always reported).

Layout (matches eval/metrics.make_lpips):
  features.N.weight / features.N.bias  — torchvision VGG16 conv params
  lin0..lin4                           — LPIPS linear head weights (C_k,)
"""

from __future__ import annotations

import sys

import numpy as np


def main(out_path: str) -> None:
    import torch
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
    except ImportError:
        print(
            "lpips package not installed; writing uniform heads "
            "(pip install lpips for the calibrated ones)",
            file=sys.stderr,
        )
        for k, c in enumerate([64, 128, 256, 512, 512]):
            out[f"lin{k}"] = np.full((c,), 1.0 / c, np.float32)

    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz")
