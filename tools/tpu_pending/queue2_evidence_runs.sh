#!/bin/bash
# Heavy TPU queue (runs after tpu_pending.sh) — round 3 evidence runs
set -x
cd /root/repo
Q=/tmp/quality
PERF="--stem_s2d 2 --head_s2d 2 --bg_s2d 4 --pad_mode same --dtype bfloat16 --temporal_prev real"
SIZING="--ngf 64 --n_blocks_translate 9 --n_downsample_translate 4 --ngf_global 48 --n_blocks_global 10 --n_downsample_global 2 --n_blocks_bg 2 --n_downsample_bg 2 --loadSize 512 --tex_tile 64"
# A. noisy pseudo-GT A/B at full scale (the refine-past-noisy-GT evidence)
timeout 14000 python tools/noisy_gt_ab.py --out /tmp/noisyab --size 512 --tile 64 \
  --epochs 20 --pre_epochs 4 --corrupt 0.6 --how_many 10 > /tmp/noisyab.log 2>&1
# B. Extended-training continuation of the ep100 checkpoint (+30 decayed
#    epochs, unchanged losses): the 64px A/B showed longer training, not a
#    heavier UV weight, moves held-out PSNR; this is the at-scale check.
#    A lambda_UV-3000 arm follows as the at-scale boost control.
for arm in ext:1000 uvboost:3000; do
  name="e2e_${arm%%:*}"; uvw="${arm##*:}"
  rm -rf $Q/ckpt/$name
  cp -r $Q/ckpt/e2e_tempreal $Q/ckpt/$name
  timeout 14000 python train.py --name $name --checkpoints_dir $Q/ckpt --continue_train \
    --batchSize 2 --pose_path $Q/data/openpose_json --mask_path $Q/data/mask \
    --img_path $Q/data/frames --densepose_path $Q/data/densepose \
    --bg_path $Q/data/bg.jpg --texture_path $Q/data/texture.png \
    --flow_path $Q/data/flow --flow_inv_path $Q/data/flow_inv \
    --no_flip --resize_or_crop resize \
    --lambda_L2 500 --lambda_UV $uvw --lambda_Prob 10 --lambda_Temp 500 \
    --use_densepose_loss --data_ratio 0.9 --niter 60 --niter_decay 70 \
    --save_epoch_freq 10 --print_freq 50 --display_freq 10000 \
    $PERF $SIZING > /tmp/${name}.log 2>&1
  timeout 3000 python tools/quality_profile.py --data $Q/data --run_dir $Q/ckpt/$name \
    --how_many 10 --ceiling_tiles 64 --out /tmp/qprof_${name}.json -- \
    $SIZING > /tmp/qprof_${name}.log 2>&1
done
# C. 1024px local-enhancer profile (VERDICT #8)
timeout 6000 python tools/profile_step.py --loadSize 1024 --netG local > /tmp/profile_1024.log 2>&1
# D. 1024px bf16-warp bench variant
timeout 6000 python tools/profile_step.py --loadSize 1024 --netG local --warp_dtype bfloat16 > /tmp/profile_1024_bf16.log 2>&1
echo TPU-QUEUE2-DONE
# E. at-scale 18Feature check: fresh two-stage 512px run with
#    --pose_heatmaps (the +0.46 dB 64px winner; fresh run because the
#    encoding changes input-conv checkpoint shapes)
mkdir -p /tmp/q18
timeout 3000 python pre_train.py --name uv18 --checkpoints_dir /tmp/q18 \
  --batchSize 6 --pose_path $Q/data/openpose_json --mask_path $Q/data/mask \
  --densepose_path $Q/data/densepose --no_flip --resize_or_crop resize \
  --data_ratio 0.9 --niter 6 --no_decay --save_epoch_freq 2 --print_freq 50 \
  --pose_heatmaps $SIZING $PERF > /tmp/q18_uv.log 2>&1
timeout 14000 python train.py --name e2e18 --checkpoints_dir /tmp/q18 \
  --batchSize 2 --pose_path $Q/data/openpose_json --mask_path $Q/data/mask \
  --img_path $Q/data/frames --densepose_path $Q/data/densepose \
  --bg_path $Q/data/bg.jpg --texture_path $Q/data/texture.png \
  --flow_path $Q/data/flow --flow_inv_path $Q/data/flow_inv \
  --no_flip --resize_or_crop resize \
  --load_pretrain_TransG /tmp/q18/uv18 --which_epoch_TransG latest \
  --lambda_L2 500 --lambda_UV 1000 --lambda_Prob 10 --lambda_Temp 500 \
  --use_densepose_loss --data_ratio 0.9 --niter 30 --no_decay \
  --save_epoch_freq 10 --print_freq 50 --display_freq 10000 \
  --pose_heatmaps $SIZING $PERF > /tmp/q18_e2e.log 2>&1
