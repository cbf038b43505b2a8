import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Vanilla 3DGS training CLI (gaussian_splatting/train.py equivalent)."""

import argparse

from sugar_tpu.pipeline import PipelineConfig, load_scene, run_vanilla

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--scene_path", required=True)
    p.add_argument("-o", "--output_dir", default="./output")
    p.add_argument("--iterations", type=int, default=7000)
    p.add_argument("--white_background", action="store_true")
    p.add_argument("--ip", default=None, help="network-GUI host (enables the "
                   "live-viewer protocol server, reference train.py:52-65)")
    p.add_argument("--port", type=int, default=6009)
    args = p.parse_args()
    cfg = PipelineConfig(
        scene_path=args.scene_path,
        output_dir=args.output_dir,
        vanilla_iterations=args.iterations,
        white_background=args.white_background,
    )
    gui = None
    if args.ip:
        from sugar_tpu.viewer.network_gui import NetworkGUI

        gui = NetworkGUI(args.ip, args.port)
    print("checkpoint:", run_vanilla(cfg, load_scene(cfg), network_gui=gui))
