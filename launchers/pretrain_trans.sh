#!/bin/bash
# Stage 1: person-agnostic UV-generator pretrain.
# Mirrors the reference launcher surface (reference: pretrainTrans.sh) —
# point the paths at your multi-person keypoints/mask/densepose pool.
DATA=${DATA:-/data/All}
python3 pre_train.py \
    --name uvGenerator_pretrain \
    --checkpoints_dir ${CKPTS:-./checkpoints} \
    --gpu_ids 0 \
    --batchSize 6 \
    --pose_path ${DATA}/keypoints/ \
    --mask_path ${DATA}/mask/ \
    --densepose_path ${DATA}/densepose/ \
    --no_flip \
    --instance_feat \
    --input_nc 3 \
    --loadSize 512 \
    --n_blocks_translate 5 \
    --resize_or_crop resize \
    --save_epoch_freq 2 \
    --tf_log
