#!/bin/bash
# Inference / pose transfer. Mirrors the reference launcher surface
# (reference: test_start/start.sh): drive a trained identity with keypoints,
# aligned to the target person via --pose_tgt_path.
DANCE_NAME=${1:?usage: test_infer.sh <dataset-name>}
ROOT=${ROOT:-/data}
python3 test.py \
    --name ${DANCE_NAME}_18Feature_Temporal \
    --checkpoints_dir ${CKPTS:-./checkpoints} \
    --pose_path ${POSE:-./keypoints} \
    --pose_tgt_path ${ROOT}/${DANCE_NAME}/openpose_json \
    --use_laplace \
    --bg_path ${ROOT}/${DANCE_NAME}/bg.jpg \
    --texture_path ${ROOT}/${DANCE_NAME}/texture.jpg \
    --TexG part \
    --n_downsample_global 2 \
    --n_blocks_global 10 \
    --ngf_global 48 \
    --use_mask_texture \
    --pose_plus_laplace \
    --n_downsample_bg 2 \
    --n_blocks_bg 2 \
    --no_flip \
    --instance_feat \
    --input_nc 3 \
    --loadSize 512 \
    --resize_or_crop resize \
    --results_dir ${RESULTS:-./results}/tgt_${DANCE_NAME} \
    --which_epoch ${EPOCH:-30}
