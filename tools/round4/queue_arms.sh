#!/bin/bash
# Round-4 queue 1: the IUV-wall arms (VERDICT r3 next-round #1) + durable
# flagship regen (#5) + the EMA A/B (#6).
#
# Five identical-recipe 512px reference-sizing two-stage runs, differing in
# ONE lever each, all with per-epoch held-out val curves (metrics.jsonl)
# and a final held-out render parity via test.py + evaluate.py on the 10
# unseen frames (data_ratio 0.9 splits sorted order: train = first 90,
# holdout = last 10 — data/dataset.py:243).
#
#   base  : control — round-2 flagship recipe as ONE run (niter 60 +
#           niter_decay 40, VGG on, temporal_prev real) + --ema_decay 0.999
#           (raw-vs-EMA scored from the same run = the EMA A/B)
#   hm18  : + --pose_heatmaps (the measured +0.46 dB 64px lever, at scale)
#   cc    : + --coord_conv    (unmeasured round-3 knob: measure or demote)
#   uvg   : + --lambda_UVgrad 500 (unmeasured round-3 knob)
#   bilin : base recipe on the --sampling bilinear corpus (model-class
#           ceiling becomes ~machine precision; progress unbounded)
#
# Logs: /tmp/r4/*.log   Results: /tmp/r4/arm_*.json   Ckpts: checkpoints/r4/
set -x
cd /root/repo
R4=/tmp/r4
D=$R4/data
DB=$R4/data_bilin
CKPT=/root/repo/checkpoints/r4
SIZING="--ngf 64 --n_blocks_translate 9 --n_downsample_translate 4 --ngf_global 48 --n_blocks_global 10 --n_downsample_global 2 --n_blocks_bg 2 --n_downsample_bg 2 --loadSize 512 --tex_tile 64"
PERF="--stem_s2d 2 --head_s2d 2 --bg_s2d 4 --pad_mode same --dtype bfloat16 --temporal_prev real"
PY=python
mkdir -p $R4 $CKPT

# ---- corpora (deterministic from the reference keypoints) ----
[ -d $D/frames ]  || timeout 1200 $PY tools/make_demo_data.py --out $D  --size 512 --tile 64 > $R4/data.log 2>&1
[ -d $DB/frames ] || timeout 1200 $PY tools/make_demo_data.py --out $DB --size 512 --tile 64 --sampling bilinear > $R4/data_bilin.log 2>&1

# holdout subsets (last 10 of sorted order = the unseen split)
for root in $D $DB; do
  mkdir -p $root/holdout_json $root/holdout_gt
  ls $root/openpose_json | sort | tail -10 | while read f; do ln -sf $root/openpose_json/$f $root/holdout_json/$f; done
  ls $root/frames | sort | tail -10 | while read f; do ln -sf $root/frames/$f $root/holdout_gt/$f; done
done

run_arm () {  # $1 arm name, $2 data dir, $3... extra flags
  local arm=$1 data=$2; shift 2
  local extra="$@"
  local uv=uv_$arm e2e=e2e_$arm
  # stage 1: UV pretrain (pretrainTrans.sh modality set)
  timeout 4500 $PY pre_train.py --name $uv --checkpoints_dir $CKPT \
    --batchSize 6 --pose_path $data/openpose_json --mask_path $data/mask \
    --densepose_path $data/densepose --no_flip --resize_or_crop resize \
    --niter 6 --no_decay --save_epoch_freq 6 --print_freq 50 \
    $SIZING $PERF $extra > $R4/${arm}_s1.log 2>&1 || return 1
  # stage 2: end-to-end, full losses, 100 epochs w/ decay, EMA on
  timeout 9000 $PY train.py --name $e2e --checkpoints_dir $CKPT \
    --batchSize 2 --pose_path $data/openpose_json --mask_path $data/mask \
    --img_path $data/frames --densepose_path $data/densepose \
    --bg_path $data/bg.jpg --texture_path $data/texture.png \
    --flow_path $data/flow --flow_inv_path $data/flow_inv \
    --no_flip --resize_or_crop resize \
    --load_pretrain_TransG $CKPT/$uv --which_epoch_TransG latest \
    --lambda_L2 500 --lambda_UV 1000 --lambda_Prob 10 --lambda_Temp 500 \
    --use_densepose_loss --data_ratio 0.9 --niter 60 --niter_decay 40 \
    --ema_decay 0.999 --save_epoch_freq 50 --print_freq 50 \
    --display_freq 10000 $SIZING $PERF $extra > $R4/${arm}_s2.log 2>&1 || return 1
  # held-out render parity (EMA weights — the evaluated track)
  timeout 3000 $PY test.py --name $e2e --checkpoints_dir $CKPT \
    --pose_path $data/holdout_json --bg_path $data/bg.jpg \
    --texture_path $data/texture.png --results_dir $R4/renders_$arm \
    --which_epoch latest --target_shape 512,512 --phase test \
    $SIZING $extra > $R4/${arm}_test.log 2>&1 || return 1
  timeout 1200 $PY evaluate.py --results_dir $R4/renders_$arm/images \
    --gt_dir $data/holdout_gt --loadSize 512 --no_vgg --metric temporal \
    --out $R4/arm_${arm}.json >> $R4/${arm}_test.log 2>&1 || return 1
}

run_arm base  $D                        && echo "ARM base DONE"
# EMA A/B: score the SAME base run with the raw (non-EMA) weights
timeout 3000 $PY test.py --name e2e_base --checkpoints_dir $CKPT \
  --pose_path $D/holdout_json --bg_path $D/bg.jpg --texture_path $D/texture.png \
  --results_dir $R4/renders_base_raw --which_epoch latest --no_ema \
  --target_shape 512,512 --phase test $SIZING > $R4/base_raw_test.log 2>&1 \
 && timeout 1200 $PY evaluate.py --results_dir $R4/renders_base_raw/images \
  --gt_dir $D/holdout_gt --loadSize 512 --no_vgg --metric temporal \
  --out $R4/arm_base_raw.json >> $R4/base_raw_test.log 2>&1 \
 && echo "ARM base_raw DONE"

run_arm hm18  $D  --pose_heatmaps       && echo "ARM hm18 DONE"
run_arm cc    $D  --coord_conv          && echo "ARM cc DONE"
run_arm uvg   $D  --lambda_UVgrad 500   && echo "ARM uvg DONE"
run_arm bilin $DB                       && echo "ARM bilin DONE"

echo R4-QUEUE1-ARMS-DONE
