#!/usr/bin/env python3
"""Person-agnostic UV-generator pretrain entry point (stage 1).

Drop-in equivalent of the reference's pre_train.py (launcher:
pretrainTrans.sh; SURVEY.md §3.3). Trains TransG alone with supervised IUV
losses against DensePose pseudo-GT; checkpoints land as
{epoch}_net_TransG.msgpack consumed by train.py --load_pretrain_TransG.
"""

from neural_human_video_rendering_tpu.runtime import setup_jax
from neural_human_video_rendering_tpu.config import TrainOptions
from neural_human_video_rendering_tpu.train.drivers import run_pretrain_uv


def main():
    setup_jax()
    opt = TrainOptions().parse()
    run_pretrain_uv(opt)


if __name__ == "__main__":
    main()
