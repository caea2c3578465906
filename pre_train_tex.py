#!/usr/bin/env python3
"""Texture-generator pretrain entry point (optional stage).

Drop-in equivalent of the reference's pre_train_tex.py (launcher:
pre_train_tex.sh; SURVEY.md §3.4). Trains TexG alone with per-part texture
reconstruction supervision.
"""

from neural_human_video_rendering_tpu.runtime import setup_jax
from neural_human_video_rendering_tpu.config import TrainOptions
from neural_human_video_rendering_tpu.train.drivers import run_pretrain_tex


def main():
    setup_jax()
    opt = TrainOptions().parse()
    run_pretrain_tex(opt)


if __name__ == "__main__":
    main()
