#!/bin/bash
# Round-4 CPU-side queue (runs while the TPU queue owns the chip; chained
# after the 64px noisy-GT A/B + anatomy finishes).
#
#   1. lc64  : --limb_coords --limb_sigma 3 on the A/B's CLEAN corpus,
#              identical recipe/seed — 64px ranking of the structural
#              lever in case the 512px lc arm misses its window
#   2. uvr64 : --uv_refine 3 --uv_refine_ngf 16 — same insurance for the
#              finer-UV head
#   3. fast test tier timing (pytest -m "not slow") — VERDICT r3 weak #7
#
# Control: the A/B clean arm (ckpt_clean/e2e metrics.jsonl, seed 0,
# pre4+24 epochs) — the same recipe round 3's 64px levers were scored on.
# Everything CPU-pinned: PALLAS_AXON_POOL_IPS= disables the accelerator
# plugin outright, JAX_PLATFORMS=cpu is belt-and-braces (runtime.setup_jax
# re-asserts it).
set -x
cd /root/repo
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
D=/tmp/nab_s0/clean
OUT=/tmp/r4cpu
PY=python
SMALL="--ngf 16 --ngf_global 16 --ndf 16 --n_blocks_translate 2 --n_downsample_translate 2 --n_blocks_global 2 --n_downsample_global 1 --n_blocks_bg 1 --n_downsample_bg 1 --dtype float32 --loadSize 64 --tex_tile 32"
mkdir -p $OUT

arm64 () {  # $1 arm, $2... extra flags
  local arm=$1; shift
  local extra="$@"
  local ckpt=$OUT/ckpt_$arm
  timeout 3600 $PY pre_train.py --name uv --checkpoints_dir $ckpt \
    --batchSize 6 --pose_path $D/openpose_json --mask_path $D/mask \
    --densepose_path $D/densepose --no_flip --resize_or_crop resize \
    --data_ratio 0.9 --niter 4 --no_decay --seed 0 \
    --save_epoch_freq 2 --print_freq 20 $SMALL $extra \
    > $OUT/${arm}_s1.log 2>&1 || return 1
  timeout 7200 $PY train.py --name e2e --checkpoints_dir $ckpt \
    --batchSize 2 --pose_path $D/openpose_json --mask_path $D/mask \
    --img_path $D/frames --densepose_path $D/densepose \
    --bg_path $D/bg.jpg --texture_path $D/texture.png \
    --flow_path $D/flow --flow_inv_path $D/flow_inv \
    --no_flip --resize_or_crop resize \
    --load_pretrain_TransG $ckpt/uv --which_epoch_TransG latest \
    --lambda_L2 500 --lambda_UV 1000 --lambda_Prob 10 --lambda_Temp 500 \
    --use_densepose_loss --no_vgg_loss --data_ratio 0.9 --niter 24 \
    --no_decay --seed 0 --save_epoch_freq 10 --print_freq 50 \
    --display_freq 10000 $SMALL $extra > $OUT/${arm}_s2.log 2>&1 || return 1
  tail -2 $ckpt/e2e/metrics.jsonl
}

arm64 lc64  --limb_coords --limb_sigma 3       && echo "ARM lc64 DONE"
arm64 uvr64 --uv_refine 3 --uv_refine_ngf 16   && echo "ARM uvr64 DONE"

# ---- fast-tier timing (1-core box; budget check, VERDICT r3 weak #7) ----
( time timeout 3600 $PY -m pytest tests/ -m "not slow" -q \
    > $OUT/fast_tier.log 2>&1 ) 2> $OUT/fast_tier.time
tail -3 $OUT/fast_tier.log
cat $OUT/fast_tier.time

echo R4-CPU-QUEUE-DONE
