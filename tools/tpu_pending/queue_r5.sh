#!/bin/bash
# Round-5 TPU queue. Self-skipping: each item exits early if its evidence
# already exists, so this can re-run blindly on a fresh box. See README.md.
set -x
cd /root/repo
R5=/tmp/r5
D=$R5/data
CKPT=/root/repo/checkpoints/r4
FLAG=/root/repo/checkpoints/flagship
ARMS=/root/repo/docs/quality/r4_arms_512px.json
SIZING="--ngf 64 --n_blocks_translate 9 --n_downsample_translate 4 --ngf_global 48 --n_blocks_global 10 --n_downsample_global 2 --n_blocks_bg 2 --n_downsample_bg 2 --loadSize 512 --tex_tile 64"
PERF="--stem_s2d 2 --head_s2d 2 --bg_s2d 4 --pad_mode same --dtype bfloat16 --temporal_prev real"
PY=python
HARD_END=${HARD_END:-9999999999}
before () { [ "$(date +%s)" -lt "$1" ]; }
mkdir -p $R5

# ---- corpus (deterministic from the reference keypoints) ----
[ -d $D/frames ] || timeout 1200 $PY tools/make_demo_data.py --out $D --size 512 --tile 64 > $R5/data.log 2>&1
mkdir -p $D/holdout_json $D/holdout_gt
ls $D/openpose_json | sort | tail -10 | while read f; do ln -sf $D/openpose_json/$f $D/holdout_json/$f; done
ls $D/frames | sort | tail -10 | while read f; do ln -sf $D/frames/$f $D/holdout_gt/$f; done

eval_arm () {  # $1 run name, $2 extra flags -> /tmp/r5/arm_$1.json
  local arm=$1; shift
  timeout 4500 $PY test.py --name e2e_$arm --checkpoints_dir $CKPT \
    --pose_path $D/holdout_json --bg_path $D/bg.jpg \
    --texture_path $D/texture.png --results_dir $R5/renders_$arm \
    --which_epoch latest --target_shape 512,512 --phase test \
    $SIZING "$@" > $R5/${arm}_test.log 2>&1 || return 1
  timeout 1200 $PY evaluate.py --results_dir $R5/renders_$arm/images \
    --gt_dir $D/holdout_gt --loadSize 512 --no_vgg --metric temporal \
    --out $R5/arm_${arm}.json >> $R5/${arm}_test.log 2>&1
}

# ---- 1. flagship promotion (combo -> checkpoints/flagship) ----
if [ ! -f $FLAG/latest_net_G.msgpack ] && [ -f $CKPT/e2e_combo/latest_net_G.msgpack ]; then
  if eval_arm combo --pose_heatmaps --coord_conv \
     && $PY - $R5/arm_combo.json <<'EOF'
import json, sys
# promote only if the holdout eval confirms the training-time val margin
sys.exit(0 if json.load(open(sys.argv[1]))["psnr"] >= 31.0 else 1)
EOF
  then
    rm -rf $FLAG && cp -r $CKPT/e2e_combo $FLAG
    # warm the driver-bench graph for the new regime + verify the number
    timeout 3600 $PY bench.py > $R5/bench_flagship.log 2>&1
    tail -1 $R5/bench_flagship.log
    echo "PROMOTED"
  fi
fi

run_arm () {  # $1 arm name, $2... extra flags (fresh two-stage 512px run)
  local arm=$1; shift
  local extra="$@"
  [ -f $R5/arm_$arm.json ] && return 0
  timeout 4500 $PY pre_train.py --name uv_$arm --checkpoints_dir $CKPT \
    --batchSize 6 --pose_path $D/openpose_json --mask_path $D/mask \
    --densepose_path $D/densepose --no_flip --resize_or_crop resize \
    --niter 6 --no_decay --save_epoch_freq 6 --print_freq 50 \
    $SIZING $PERF $extra > $R5/${arm}_s1.log 2>&1 || return 1
  timeout 10000 $PY train.py --name e2e_$arm --checkpoints_dir $CKPT \
    --batchSize 2 --pose_path $D/openpose_json --mask_path $D/mask \
    --img_path $D/frames --densepose_path $D/densepose \
    --bg_path $D/bg.jpg --texture_path $D/texture.png \
    --flow_path $D/flow --flow_inv_path $D/flow_inv \
    --no_flip --resize_or_crop resize \
    --load_pretrain_TransG $CKPT/uv_$arm --which_epoch_TransG latest \
    --lambda_L2 500 --lambda_UV 1000 --lambda_Prob 10 --lambda_Temp 500 \
    --use_densepose_loss --data_ratio 0.9 --niter 60 --niter_decay 40 \
    --ema_decay 0.999 --save_epoch_freq 50 --print_freq 50 \
    --display_freq 10000 $SIZING $PERF $extra > $R5/${arm}_s2.log 2>&1 || return 1
  eval_arm $arm $extra
}

# ---- 2-3. the two unmeasured structural 512px arms ----
if ! grep -q '"uvr"' $ARMS 2>/dev/null && before $((HARD_END - 10000)); then
  run_arm uvr --uv_refine 3 && echo "ARM uvr DONE"
fi
if ! grep -q '"lc"' $ARMS 2>/dev/null && before $((HARD_END - 8000)); then
  run_arm lc --limb_coords && echo "ARM lc DONE"
fi

# ---- 4. combo extension: +40 decayed epochs chasing 33 dB ----
# DONE in round 4 (val 33.30 / holdout 32.90, promoted to flagship);
# self-skips via the arms json.
if ! grep -q '"comboext"' $ARMS 2>/dev/null \
   && [ -f $CKPT/e2e_combo/latest_net_G.msgpack ] \
   && before $((HARD_END - 6000)); then
  rm -rf $CKPT/e2e_comboext && cp -r $CKPT/e2e_combo $CKPT/e2e_comboext
  timeout 5400 $PY train.py --name e2e_comboext --checkpoints_dir $CKPT \
    --continue_train \
    --batchSize 2 --pose_path $D/openpose_json --mask_path $D/mask \
    --img_path $D/frames --densepose_path $D/densepose \
    --bg_path $D/bg.jpg --texture_path $D/texture.png \
    --flow_path $D/flow --flow_inv_path $D/flow_inv \
    --no_flip --resize_or_crop resize \
    --lambda_L2 500 --lambda_UV 1000 --lambda_Prob 10 --lambda_Temp 500 \
    --use_densepose_loss --data_ratio 0.9 --niter 80 --niter_decay 80 \
    --ema_decay 0.999 --save_epoch_freq 50 --print_freq 50 \
    --display_freq 10000 $SIZING $PERF --pose_heatmaps --coord_conv \
    > $R5/comboext_s2.log 2>&1 \
   && eval_arm comboext --pose_heatmaps --coord_conv && echo "COMBOEXT DONE"
fi

# ---- 4b. flagship second extension: +60 more decayed epochs ----
# DONE in round 4: val 33.46 / holdout 33.07 dB, promoted to flagship
# (best arm of the round, +3.13 dB vs base). Self-skips via the arms json.
if ! grep -q '"comboext2"' $ARMS 2>/dev/null \
   && [ -f $FLAG/latest_net_G.msgpack ] \
   && before $((HARD_END - 6000)); then
  rm -rf $CKPT/e2e_comboext2 && cp -r $FLAG $CKPT/e2e_comboext2
  timeout 5400 $PY train.py --name e2e_comboext2 --checkpoints_dir $CKPT \
    --continue_train \
    --batchSize 2 --pose_path $D/openpose_json --mask_path $D/mask \
    --img_path $D/frames --densepose_path $D/densepose \
    --bg_path $D/bg.jpg --texture_path $D/texture.png \
    --flow_path $D/flow --flow_inv_path $D/flow_inv \
    --no_flip --resize_or_crop resize \
    --lambda_L2 500 --lambda_UV 1000 --lambda_Prob 10 --lambda_Temp 500 \
    --use_densepose_loss --data_ratio 0.9 --niter 80 --niter_decay 140 \
    --ema_decay 0.999 --save_epoch_freq 60 --print_freq 50 \
    --display_freq 10000 $SIZING $PERF --pose_heatmaps --coord_conv \
    > $R5/comboext2_s2.log 2>&1 \
   && eval_arm comboext2 --pose_heatmaps --coord_conv && echo "COMBOEXT2 DONE"
fi

# ---- 4c. combouvr extension: structure + the long schedule ----
# combouvr (combo + --uv_refine 3) hit 33.05 dB holdout in only 120
# epochs — what the pure-schedule flagship needed 220 to reach (33.07).
# The open question is whether structure+schedule stack: extend combouvr
# ep120 -> 220 with the same warm-restart decay trick. Self-skips once
# the arms json has a combouvrext entry.
if ! grep -q '"combouvrext"' $ARMS 2>/dev/null \
   && [ -f $CKPT/e2e_combouvr/latest_net_G.msgpack ] \
   && before $((HARD_END - 6000)); then
  rm -rf $CKPT/e2e_combouvrext && cp -r $CKPT/e2e_combouvr $CKPT/e2e_combouvrext
  timeout 5400 $PY train.py --name e2e_combouvrext --checkpoints_dir $CKPT \
    --continue_train \
    --batchSize 2 --pose_path $D/openpose_json --mask_path $D/mask \
    --img_path $D/frames --densepose_path $D/densepose \
    --bg_path $D/bg.jpg --texture_path $D/texture.png \
    --flow_path $D/flow --flow_inv_path $D/flow_inv \
    --no_flip --resize_or_crop resize \
    --lambda_L2 500 --lambda_UV 1000 --lambda_Prob 10 --lambda_Temp 500 \
    --use_densepose_loss --data_ratio 0.9 --niter 80 --niter_decay 140 \
    --ema_decay 0.999 --save_epoch_freq 60 --print_freq 50 \
    --display_freq 10000 $SIZING $PERF --pose_heatmaps --coord_conv --uv_refine 3 \
    > $R5/combouvrext_s2.log 2>&1 \
   && eval_arm combouvrext --pose_heatmaps --coord_conv --uv_refine 3 \
   && echo "COMBOUVREXT DONE"
fi

# ---- 5. 1024px local-enhancer profile (VERDICT r3 #7) ----
# DONE in round 4 (docs/perf/profile_1024_{f32,bf16}.log + PERFORMANCE.md
# section); the durable-evidence gate below self-skips on any box.
if [ ! -f docs/perf/profile_1024_f32.log ] && before $((HARD_END - 3000)); then
  timeout 3000 $PY tools/profile_step.py --loadSize 1024 --netG local \
    --batchSize 1 --ngf 32 --ngf_global 24 \
    --out $R5/profile_1024 > $R5/profile_1024.log 2>&1 && echo "PROFILE1024 DONE"
fi

# ---- 6. 512px noisy pseudo-GT A/B ----
if [ ! -f docs/quality/noisy_gt_ab_512px.json ] && before $((HARD_END - 20000)); then
  timeout 20000 $PY tools/noisy_gt_ab.py --out $R5/noisyab512 --size 512 \
    --tile 64 --epochs 20 --pre_epochs 4 --corrupt 0.6 --how_many 10 \
    > $R5/noisyab512.log 2>&1 && echo "NOISYAB512 DONE"
fi

echo R5-QUEUE-DONE
