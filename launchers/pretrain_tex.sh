#!/bin/bash
# Optional stage: texture-generator pretrain.
# Mirrors the reference launcher surface (reference: pre_train_tex.sh).
SEQ=${1:?usage: pretrain_tex.sh <sequence-dir>}
python3 pre_train_tex.py \
    --name pretrain_tex_200 \
    --gpu_ids 0 \
    --batchSize 2 \
    --pose_path ${SEQ}/openpose_img \
    --lapalce_path ${SEQ}/LaplaceProj \
    --use_laplace \
    --part_texture_path ${SEQ}/part_texture \
    --pose_texture_path ${SEQ}/Laplace_texture \
    --texture_path ${SEQ}/texture.jpg \
    --TexG part \
    --use_mask_texture \
    --n_downsample_global 2 \
    --n_blocks_global 5 \
    --ngf_global 64 \
    --no_flip \
    --instance_feat \
    --input_nc 81 \
    --loadSize 200 \
    --resize_or_crop resize \
    --save_epoch_freq 5 \
    --tf_log \
    --data_ratio 0.9
