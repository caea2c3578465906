#!/bin/bash
# Stage 2: end-to-end person-specific training.
# Mirrors the reference launcher surface (reference: train_start/pretrain_start.sh).
DANCE_NAME=${1:?usage: train_e2e.sh <dataset-name>}
ROOT=${ROOT:-/data}
python3 train.py \
    --name ${DANCE_NAME}_18Feature_Temporal \
    --batchSize 2 \
    --gpu_ids 0 \
    --use_laplace \
    --checkpoints_dir ${CKPTS:-./checkpoints} \
    --pose_path ${ROOT}/${DANCE_NAME}/openpose_json \
    --mask_path ${ROOT}/${DANCE_NAME}/mask \
    --img_path ${ROOT}/${DANCE_NAME}/${DANCE_NAME} \
    --densepose_path ${ROOT}/${DANCE_NAME}/densepose \
    --bg_path ${ROOT}/${DANCE_NAME}/bg.jpg \
    --texture_path ${ROOT}/${DANCE_NAME}/texture.jpg \
    --flow_path ${ROOT}/${DANCE_NAME}/flow \
    --flow_inv_path ${ROOT}/${DANCE_NAME}/flow_inv \
    --lapalce_path ${ROOT}/${DANCE_NAME}/LaplaceProj \
    --no_flip \
    --instance_feat \
    --input_nc 3 \
    --loadSize 512 \
    --resize_or_crop resize \
    --tf_log \
    --load_pretrain_TransG ${CKPTS:-./checkpoints}/uvGenerator_pretrain \
    --which_epoch_TransG 2 \
    --lambda_L2 500 \
    --lambda_UV 1000 \
    --lambda_Prob 10 \
    --use_densepose_loss \
    --save_epoch_freq 5 \
    --data_ratio 0.9 \
    --lambda_Temp 500
