#!/usr/bin/env python3
"""Fabricate the full data-contract tree from the reference keypoint demo.

The reference demo (test_start/start.sh) drives a trained checkpoint with
the 100 on-disk OpenPose JSONs; this environment has no real video, so this
tool turns that same keypoint sequence into a deterministic, learnable
dataset (frames/mask/densepose/flow/bg/texture — see
data/synthetic_video.py for the construction) that the stage-1/stage-2
launchers can train on with path edits only:

    python tools/make_demo_data.py --out /tmp/demo_data --size 512
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--tile", type=int, default=64)
    p.add_argument("--keypoints", default="/root/reference/keypoints",
                   help="driving OpenPose JSON dir (reference demo corpus)")
    p.add_argument("--repeat", type=int, default=1,
                   help="loop the sequence N times for a longer corpus")
    p.add_argument("--people", type=int, default=1,
                   help="pool N body-proportion variants of the sequence "
                        "(person-agnostic stage-1 pretraining corpus, "
                        "pretrainTrans.sh's multi-person intent)")
    p.add_argument("--laplace_ch", type=int, default=0)
    p.add_argument("--corrupt", type=float, default=0.0,
                   help="0..1: corrupt the pseudo-GT (mask/densepose/bg) at "
                        "this strength while frames stay true "
                        "(data/corruption.py — the noisy-supervision regime "
                        "the reference's online refinement trains past)")
    p.add_argument("--corrupt_seed", type=int, default=0)
    p.add_argument("--sampling", default="nearest",
                   choices=["nearest", "bilinear"],
                   help="atlas sampling for the TRUE frames: bilinear makes "
                        "machine-precision reconstruction reachable by the "
                        "(bilinear-warping) model; nearest keeps round-2 "
                        "artifact continuity (~45 dB class ceiling)")
    a = p.parse_args()

    import numpy as np
    from neural_human_video_rendering_tpu.data import synthetic_video as sv

    joints = sv.load_reference_joints(a.keypoints, a.size)
    if a.repeat > 1:
        joints = np.concatenate([joints] * a.repeat)
    cuts = ()
    if a.people > 1:
        pool = [sv.person_variant(joints, a.size, p_) for p_ in range(a.people)]
        cuts = tuple(len(joints) * p_ for p_ in range(1, a.people))
        joints = np.concatenate(pool)
    os.makedirs(a.out, exist_ok=True)
    paths = sv.write_corpus(a.out, joints, size=a.size, tile=a.tile,
                            laplace_ch=a.laplace_ch, cuts=cuts,
                            corrupt=a.corrupt, corrupt_seed=a.corrupt_seed,
                            sampling=a.sampling)
    print(f"wrote {len(joints)} frames -> {a.out}")
    for k, v in sorted(paths.items()):
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
