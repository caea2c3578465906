#!/usr/bin/env python3
"""Static texture-atlas builder (unfold_texture.py equivalent).

Reference usage: ``python unfold_texture.py $video_frame_dir $densepose_dir``
(reference: README.md:64); writes texture.jpg (4x6 grid of 24 part tiles)
next to the frame dir unless --out is given.
"""

import argparse
import os

from neural_human_video_rendering_tpu.data.texture_unfold import unfold_texture


def main():
    p = argparse.ArgumentParser()
    p.add_argument("frame_dir")
    p.add_argument("densepose_dir")
    p.add_argument("--out", default="")
    p.add_argument("--tile", type=int, default=128)
    p.add_argument("--max_frames", type=int, default=500)
    args = p.parse_args()
    out = args.out or os.path.join(os.path.dirname(args.frame_dir.rstrip("/")),
                                   "texture.jpg")
    path = unfold_texture(args.frame_dir, args.densepose_dir, out,
                          tile=args.tile, max_frames=args.max_frames)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
