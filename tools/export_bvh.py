"""Export synthesis PKLs to BVH character animation.

Replaces the reference's Blender-rig workflow (reference README.md:103-117:
a binary poseRender.blend whose embedded renderAnim.py retargets generated
PKLs onto a rigged character, Blender 2.79 only): this writes standard BVH
next to each PKL, importable by any Blender version / DCC for the same
retargeting step.

    python tools/export_bvh.py output/sample/*.pkl [--fps 15] [--scale 100]
                               [--key out_dir_vec] [--out DIR]
"""

import argparse
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gesture_generation_from_trimodal_context_tpu.interop.bvh_export import (  # noqa: E402
    export_bvh)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pkls", nargs="+",
                    help="synthesis PKL files (globs ok)")
    ap.add_argument("--fps", type=float, default=15.0,
                    help="motion frame rate (reference: 15)")
    ap.add_argument("--scale", type=float, default=100.0,
                    help="offset scale; 100 = meters->cm (common rig units)")
    ap.add_argument("--key", default="out_dir_vec",
                    choices=["out_dir_vec", "human_dir_vec"],
                    help="which PKL motion to export")
    ap.add_argument("--out", default=None,
                    help="output dir (default: next to each PKL)")
    args = ap.parse_args()

    paths = []
    for pattern in args.pkls:
        hits = sorted(glob.glob(pattern))
        paths.extend(hits if hits else [pattern])

    n = 0
    for path in paths:
        with open(path, "rb") as f:
            data = pickle.load(f)
        if args.key not in data or data[args.key] is None:
            print("skip %s: no %s" % (path, args.key))
            continue
        vec = np.asarray(data[args.key])
        out_dir = args.out or os.path.dirname(path) or "."
        os.makedirs(out_dir, exist_ok=True)
        base = os.path.splitext(os.path.basename(path))[0]
        suffix = "" if args.key == "out_dir_vec" else "_human"
        dst = os.path.join(out_dir, base + suffix + ".bvh")
        export_bvh(vec, dst, fps=args.fps, scale=args.scale)
        print("wrote %s (%d frames)" % (dst, len(vec)))
        n += 1
    if n == 0:
        sys.exit("no BVH written")


if __name__ == "__main__":
    main()
