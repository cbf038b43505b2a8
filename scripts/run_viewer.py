import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Viewer launcher (reference run_viewer.py:26-47): validates the
ply/obj/png triplet and writes the viewer's scene descriptor."""

import argparse

from sugar_tpu.viewer.export import write_scene_descriptor

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-p", "--ply_path", required=True, help="refined gaussian PLY")
    p.add_argument("-m", "--obj_path", default=None, help="textured OBJ (optional)")
    p.add_argument("--viewer_dir", default="./sugar_viewer")
    args = p.parse_args()
    out = write_scene_descriptor(args.viewer_dir, args.ply_path, args.obj_path)
    print("scene descriptor:", out)
    print("Serve any @mkkellogg/gaussian-splats-3d viewer (e.g. the reference's "
          "sugar_viewer) pointed at this descriptor.")
