#!/usr/bin/env python3
"""End-to-end person-specific training entry point (stage 2).

Drop-in equivalent of the reference's train.py — the reference launcher
train_start/pretrain_start.sh runs against this script with path edits only
(SURVEY.md §3.2 for the reproduced control flow).
"""

from neural_human_video_rendering_tpu.runtime import setup_jax
from neural_human_video_rendering_tpu.config import TrainOptions
from neural_human_video_rendering_tpu.train.drivers import run_train


def main():
    setup_jax()
    opt = TrainOptions().parse()
    run_train(opt)


if __name__ == "__main__":
    main()
