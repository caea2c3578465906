#!/usr/bin/env python3
"""Cross-person pose retargeting tool (graph_posenorm.py equivalent).

Drop-in CLI match for the reference launcher data/data_prep/run_alignPose.sh
(flags: --target_keypoints --source_keypoints --target_shape --source_shape
--source_frames --results --target_spread --source_spread
--calculate_scale_translation). Fits a global scale+translation from corpus
statistics and rewrites the source keypoint JSONs into the target frame
(SURVEY.md §3.5; spec in data/pose_align.py).
"""

import argparse

from neural_human_video_rendering_tpu.data import pose_align


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--target_keypoints", required=True)
    p.add_argument("--source_keypoints", required=True)
    p.add_argument("--target_shape", type=int, nargs=3, default=[1024, 1024, 3])
    p.add_argument("--source_shape", type=int, nargs=3, default=[1024, 1024, 3])
    p.add_argument("--source_frames", default="")
    p.add_argument("--results", required=True)
    p.add_argument("--target_spread", type=float, nargs=2, default=[0.0, 1e9])
    p.add_argument("--source_spread", type=float, nargs=2, default=[0.0, 1e9])
    p.add_argument("--calculate_scale_translation", action="store_true")
    args = p.parse_args()

    s, t = pose_align.fit_scale_translation(
        args.target_keypoints, args.source_keypoints,
        tuple(args.target_spread), tuple(args.source_spread),
        target_shape=tuple(args.target_shape[:2]),
        source_shape=tuple(args.source_shape[:2]))
    print(f"scale: {s:.4f}  translation: ({t[0]:.2f}, {t[1]:.2f})")
    n = pose_align.align_pose_dir(args.source_keypoints, args.results, s, t)
    print(f"wrote {n} aligned keypoint files -> {args.results}")
    pose_align.write_align_meta(args.results, s, t,
                                tuple(args.target_shape[:2]),
                                tuple(args.source_shape[:2]))
    if args.source_frames:
        m = pose_align.write_debug_overlays(args.source_frames, args.results,
                                            tuple(args.target_shape[:2]))
        print(f"wrote {m} debug overlays -> {args.results}/overlay")


if __name__ == "__main__":
    main()
