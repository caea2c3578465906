#!/bin/bash
# Round-4 queue 2 (chained after queue_arms.sh): the remaining hardware
# items of VERDICT r3, ordered by value/cost with the round-end driver
# bench in mind (memory: chip must be FREE before the driver runs bench).
#
#   1. bench.py on its promoted defaults (trained flagship + bf16 warp) —
#      validates the new headline path AND warms the compile cache for the
#      round-end driver bench                             (VERDICT next #2)
#   2. serving re-export on e2e_base + HTTP ladder re-measure     (next #3)
#   3. transfer-parity refresh at ep100 (scripted fabrication)    (next #5)
#   4. bf16-warp holdout neutrality A/B on e2e_base       (evidence for #2)
#   5. combo arm: stack of every arm lever measured ≥ +0.15 dB    (next #1)
#      — built dynamically from the queue-1 arm JSONs (hm18 +2.32 is in;
#      cc +0.17 is in; uvg −0.69 is OUT; uvr joins if it clears +0.3)
#   6. uvr arm : --uv_refine 3   (512px; likely skipped this window —
#      cold compile ~95 min doesn't fit after combo; 64px fallback on CPU)
#   7. lc arm : --limb_coords   (likely skipped; queued for next window)
#   8. 1024px local-enhancer profile                              (next #7)
#   9. 512px noisy pseudo-GT A/B (likely skipped — 64px anatomy runs on
#      CPU in parallel; see tools/round4/noisyab_anatomy.py)      (next #4)
#
# Deadline guards: each heavy item starts only if it can FINISH before
# HARD_END. All times UTC epoch seconds.
set -x
cd /root/repo
R4=/tmp/r4
D=$R4/data
CKPT=/root/repo/checkpoints/r4
SIZING="--ngf 64 --n_blocks_translate 9 --n_downsample_translate 4 --ngf_global 48 --n_blocks_global 10 --n_downsample_global 2 --n_blocks_bg 2 --n_downsample_bg 2 --loadSize 512 --tex_tile 64"
PERF="--stem_s2d 2 --head_s2d 2 --bg_s2d 4 --pad_mode same --dtype bfloat16 --temporal_prev real"
PY=python
HARD_END=${HARD_END:-$(date -d "15:55" +%s 2>/dev/null || echo 9999999999)}

before () { [ "$(date +%s)" -lt "$1" ]; }

# ---- 1. promoted-default bench (also caches the driver-bench graph) ----
timeout 3600 $PY bench.py > $R4/bench_default.log 2>&1
tail -1 $R4/bench_default.log

# ---- 2. serving re-export (deployment config) + HTTP ladder ----
if before $((HARD_END - 2400)); then
  timeout 3000 $PY tools/export_serving.py --name e2e_base \
    --checkpoints_dir $CKPT --which_epoch latest --batch 8 \
    --bg_path $D/bg.jpg --texture_path $D/texture.png \
    --warp_dtype bfloat16 --out $R4/model512_r4.jaxexport \
    $SIZING > $R4/export_r4.log 2>&1 \
   && timeout 3000 $PY tools/round4/bench_serve.py \
    --model $R4/model512_r4.jaxexport --out $R4/serve_ladder_r4.json \
    > $R4/serve_ladder.log 2>&1 \
   && echo "SERVING DONE"
fi

# ---- 3. transfer-parity refresh at ep100 (scripted fabrication) ----
if before $((HARD_END - 2400)); then
  XF=$R4/xfer
  mkdir -p $XF
  $PY tools/round4/fabricate_source.py --src $D/openpose_json \
    --out $XF/source > $R4/xfer.log 2>&1
  timeout 1200 $PY graph_posenorm.py --target_keypoints $D/openpose_json \
    --source_keypoints $XF/source --results $XF/aligned \
    --calculate_scale_translation --target_shape 512 512 3 \
    --source_shape 900 700 3 >> $R4/xfer.log 2>&1
  timeout 3000 $PY test.py --name e2e_base --checkpoints_dir $CKPT \
    --pose_path $XF/aligned --bg_path $D/bg.jpg --texture_path $D/texture.png \
    --results_dir $XF/renders --which_epoch latest --target_shape 512,512 \
    --phase test $SIZING >> $R4/xfer.log 2>&1 \
   && timeout 1200 $PY evaluate.py --results_dir $XF/renders/images \
    --gt_dir $D/frames --loadSize 512 --no_vgg \
    --out $XF/transfer_parity_r4.json >> $R4/xfer.log 2>&1 \
   && echo "TRANSFER DONE"
fi

# ---- 4. bf16-warp holdout neutrality A/B ----
if before $((HARD_END - 1800)); then
  timeout 3000 $PY test.py --name e2e_base --checkpoints_dir $CKPT \
    --pose_path $D/holdout_json --bg_path $D/bg.jpg --texture_path $D/texture.png \
    --results_dir $R4/renders_base_bf16w --which_epoch latest \
    --warp_dtype bfloat16 --target_shape 512,512 --phase test \
    $SIZING > $R4/base_bf16w_test.log 2>&1 \
   && timeout 1200 $PY evaluate.py --results_dir $R4/renders_base_bf16w/images \
    --gt_dir $D/holdout_gt --loadSize 512 --no_vgg --metric temporal \
    --out $R4/arm_base_bf16warp.json >> $R4/base_bf16w_test.log 2>&1 \
   && echo "BF16WARP-AB DONE"
fi

run_arm () {  # $1 arm name, $2 data dir, $3... extra flags
  local arm=$1 data=$2; shift 2
  local extra="$@"
  local uv=uv_$arm e2e=e2e_$arm
  timeout 4500 $PY pre_train.py --name $uv --checkpoints_dir $CKPT \
    --batchSize 6 --pose_path $data/openpose_json --mask_path $data/mask \
    --densepose_path $data/densepose --no_flip --resize_or_crop resize \
    --niter 6 --no_decay --save_epoch_freq 6 --print_freq 50 \
    $SIZING $PERF $extra > $R4/${arm}_s1.log 2>&1 || return 1
  timeout 9000 $PY train.py --name $e2e --checkpoints_dir $CKPT \
    --batchSize 2 --pose_path $data/openpose_json --mask_path $data/mask \
    --img_path $data/frames --densepose_path $data/densepose \
    --bg_path $data/bg.jpg --texture_path $data/texture.png \
    --flow_path $data/flow --flow_inv_path $data/flow_inv \
    --no_flip --resize_or_crop resize \
    --load_pretrain_TransG $CKPT/$uv --which_epoch_TransG latest \
    --lambda_L2 500 --lambda_UV 1000 --lambda_Prob 10 --lambda_Temp 500 \
    --use_densepose_loss --data_ratio 0.9 \
    --niter ${ARM_NITER:-60} --niter_decay ${ARM_DECAY:-40} \
    --ema_decay 0.999 --save_epoch_freq 50 --print_freq 50 \
    --display_freq 10000 $SIZING $PERF $extra > $R4/${arm}_s2.log 2>&1 || return 1
  timeout 3000 $PY test.py --name $e2e --checkpoints_dir $CKPT \
    --pose_path $data/holdout_json --bg_path $data/bg.jpg \
    --texture_path $data/texture.png --results_dir $R4/renders_$arm \
    --which_epoch latest --target_shape 512,512 --phase test \
    $SIZING $extra > $R4/${arm}_test.log 2>&1 || return 1
  timeout 1200 $PY evaluate.py --results_dir $R4/renders_$arm/images \
    --gt_dir $data/holdout_gt --loadSize 512 --no_vgg --metric temporal \
    --out $R4/arm_${arm}.json >> $R4/${arm}_test.log 2>&1 || return 1
}

# arm_wins ARM MIN_DELTA: 0 iff arm_$1.json beats arm_base.json by >= $2 dB
arm_wins () {
  $PY - "$R4/arm_base.json" "$R4/arm_$1.json" "$2" <<'EOF'
import json, sys
try:
    base = json.load(open(sys.argv[1]))["psnr"]
    arm = json.load(open(sys.argv[2]))["psnr"]
except Exception:
    sys.exit(1)
sys.exit(0 if arm - base >= float(sys.argv[3]) else 1)
EOF
}

# ---- 5. combo arm: stack every measured-positive lever ----
# Runs BEFORE the uvr arm: on this window's clock a cold-compile uvr
# (~95 min) would push combo past its own deadline guard, and combo is
# the round's flagship 33 dB push while uvr has a 64px CPU-queue
# fallback (tools/round4/cpu_queue.sh). uvr joins the stack only if its
# 512px JSON already exists (it won't in this window — arm_wins fails
# closed on a missing file).
if before $((HARD_END - 6600)); then
  COMBO=""
  arm_wins hm18 0.15 && COMBO="$COMBO --pose_heatmaps"
  arm_wins cc   0.15 && COMBO="$COMBO --coord_conv"
  arm_wins uvr  0.30 && COMBO="$COMBO --uv_refine 3"
  echo "COMBO FLAGS: $COMBO"
  # The combo is the flagship push, not a controlled lever: every arm's
  # val curve is still rising ~+0.03 dB/epoch at ep100, so give it the
  # longer schedule (80+40). Stack attribution comes from the
  # single-lever arms; this run chases the 33 dB target.
  [ -n "$COMBO" ] && ARM_NITER=80 ARM_DECAY=40 run_arm combo $D $COMBO \
    && echo "ARM combo DONE"
fi

# ---- 6. the finer-UV structural lever (cold compile: new graph) ----
before $((HARD_END - 7200)) && run_arm uvr $D --uv_refine 3 && echo "ARM uvr DONE"

# ---- 7. lc arm (--limb_coords): only if the window allows ----
before $((HARD_END - 6600)) && run_arm lc $D --limb_coords && echo "ARM lc DONE"

# ---- 8. 1024px local-enhancer profile ----
before $((HARD_END - 2400)) \
 && timeout 2400 $PY tools/profile_step.py --loadSize 1024 --netG local \
      --out $R4/profile_1024 > $R4/profile_1024.log 2>&1 \
 && echo "PROFILE1024 DONE"

# ---- 9. 512px noisy pseudo-GT A/B (usually skipped; 64px anatomy on CPU) ----
before $((HARD_END - 5400)) \
 && timeout 5400 $PY tools/noisy_gt_ab.py --out $R4/noisyab512 \
      > $R4/noisyab512.log 2>&1 \
 && echo "NOISYAB512 DONE"

echo R4-QUEUE2-DONE
