#!/usr/bin/env python3
"""Inference / pose-transfer entry point.

Drop-in equivalent of the reference's test.py — the reference launcher
test_start/start.sh runs against this script with path edits only
(SURVEY.md §3.1 for the reproduced control flow).
"""

from neural_human_video_rendering_tpu.runtime import setup_jax
from neural_human_video_rendering_tpu.config import TestOptions
from neural_human_video_rendering_tpu.infer.test_driver import run_inference


def main():
    setup_jax()
    opt = TestOptions().parse(save=False)
    run_inference(opt)


if __name__ == "__main__":
    main()
