#!/bin/bash
# Regenerate a trained bench-regime checkpoint into checkpoints/flagship.
#
# Why this exists: trained weights are 772 MB (G alone) — too big for git —
# and a box recycle has now destroyed the durable flagship twice (round 3:
# /tmp; round 4 close: checkpoints/ blobs are gitignored, so a fresh clone
# has recipes but no weights). Without a checkpoint, bench.py falls back to
# the random-init regime (warp block-skip worst case, ~6.0 steps/s instead
# of ~6.5). This script restores the TRAINED regime from nothing in ~25 min
# on one v5e chip: deterministic corpus from the reference keypoints, then
# a shortened combo-recipe schedule (stage-1 6 ep + stage-2 40 ep) — enough
# for peaked part probabilities even though holdout quality lands below the
# full 220-epoch flagship (whose recipe is preserved alongside as
# checkpoints/flagship/recipe_comboext2_full.json).
#
# Run blindly on any fresh box: bash tools/regen_bench_flagship.sh
set -x
cd "$(dirname "$0")/.."
ROOT=$(pwd)
D=/tmp/r4/data
[ -d $D/frames ] || { mkdir -p /tmp/r4 && \
  timeout 1200 python tools/make_demo_data.py --out $D --size 512 --tile 64 \
  > /tmp/r4/data.log 2>&1 || exit 1; }
CKPT=$ROOT/checkpoints/r4
SIZING="--ngf 64 --n_blocks_translate 9 --n_downsample_translate 4 --ngf_global 48 --n_blocks_global 10 --n_downsample_global 2 --n_blocks_bg 2 --n_downsample_bg 2 --loadSize 512 --tex_tile 64"
PERF="--stem_s2d 2 --head_s2d 2 --bg_s2d 4 --pad_mode same --dtype bfloat16 --temporal_prev real"

# print_freq doubles as the relay keep-alive: the loss print is the loop's
# only blocking device fetch, and on the round-5 second-window box a
# process whose FIRST fetch came after ~50 async-dispatched 512px steps
# wedged the relay stream permanently (two identical stalls at the epoch
# 3/4 boundary of this stage-1; runs that fetched by iter 20 never
# wedged). Keep the first fetch inside the first epoch: stage-1 16
# steps/epoch -> print_freq 12; stage-2 45 steps/epoch -> print_freq 40.
timeout 900 python pre_train.py --name uv_regen --checkpoints_dir $CKPT \
  --batchSize 6 --pose_path $D/openpose_json --mask_path $D/mask \
  --densepose_path $D/densepose --no_flip --resize_or_crop resize \
  --niter 6 --no_decay --save_epoch_freq 6 --print_freq 12 \
  $SIZING $PERF --pose_heatmaps --coord_conv > /tmp/regen_s1.log 2>&1 || exit 1
echo S1-DONE

# --save_latest_freq 1350 (~every 30 epochs): frequent 'latest' saves make
# any cut point installable, but a full save FETCHES ~1.5 GB of params
# through the relay tunnel (~10-20 MB/s) — measured ~5-6 min per save on
# the round-5 second-window box — so the original 135-iter spacing (~every
# 3 epochs) would spend ~1 h of a 40-epoch run just saving (the r4 box's
# tunnel was faster; this knob is tunnel-speed-dependent). 1350 (the
# round-5 queue's spacing, same reasoning) gives one mid-run cut point
# (~ep 30) plus the final save. Budget 3600 s: ~10 min cold compile +
# ~15 min of epochs + 2 saves; any cut past ~epoch 20 is bench-grade.
timeout 3600 python train.py --name e2e_regen --checkpoints_dir $CKPT \
  --batchSize 2 --pose_path $D/openpose_json --mask_path $D/mask \
  --img_path $D/frames --densepose_path $D/densepose \
  --bg_path $D/bg.jpg --texture_path $D/texture.png \
  --flow_path $D/flow --flow_inv_path $D/flow_inv \
  --no_flip --resize_or_crop resize \
  --load_pretrain_TransG $CKPT/uv_regen --which_epoch_TransG latest \
  --lambda_L2 500 --lambda_UV 1000 --lambda_Prob 10 --lambda_Temp 500 \
  --use_densepose_loss --data_ratio 0.9 --niter 30 --niter_decay 10 \
  --ema_decay 0.999 --save_epoch_freq 40 --save_latest_freq 1350 \
  --print_freq 40 --display_freq 10000 $SIZING $PERF \
  --pose_heatmaps --coord_conv > /tmp/regen_s2.log 2>&1
# install whatever 'latest' the run managed to save, even if it timed out
[ -f $CKPT/e2e_regen/latest_net_G.msgpack ] || exit 1
echo S2-DONE

# install: keep the full-flagship recipe alongside (guarded — a second run
# would otherwise overwrite the preserved 220-epoch recipe with the regen
# one, ADVICE r4 #2), then swap the COMPLETE weight set in. metrics.jsonl
# comes along so the dir's quality record describes the installed weights,
# not a long-dead flagship (ADVICE r4 #1).
FLAG=$ROOT/checkpoints/flagship
SRC=$CKPT/e2e_regen
if [ ! -f $FLAG/recipe_comboext2_full.json ] && [ -f $FLAG/recipe.json ] \
   && ! grep -q '"e2e_regen"' $FLAG/recipe.json; then
  cp $FLAG/recipe.json $FLAG/recipe_comboext2_full.json
fi
mkdir -p $FLAG
cp $SRC/latest_net_G.msgpack $FLAG/
# D + TransG + optimizer state: bench.py degrades gracefully without D now,
# but a complete install keeps --continue_train forks possible (VERDICT r4
# next #1a: the round-4 bench crash was exactly a missing D here)
for f in latest_net_D.msgpack latest_net_TransG.msgpack latest_state.msgpack; do
  [ -f $SRC/$f ] && cp $SRC/$f $FLAG/ || echo "WARN: $SRC/$f absent — skipped"
done
if [ -f $SRC/latest_net_G_ema.msgpack ]; then
  cp $SRC/latest_net_G_ema.msgpack $FLAG/
else
  echo "WARNING: no latest_net_G_ema.msgpack — installed flagship serves RAW
  weights while the run's val PSNR was measured on the EMA track
  (drivers.py evaluates g_ema when ema_decay>0); expect slightly lower
  served quality than metrics.jsonl reports" | tr -s ' '
fi
cp $SRC/recipe.json $FLAG/recipe.json
cp $SRC/opt.txt $FLAG/opt.txt
cp $SRC/metrics.jsonl $FLAG/metrics.jsonl
# self-describing provenance next to the recipe (ADVICE r4 #5)
python - "$SRC" "$FLAG" <<'EOF'
import json, sys, datetime
src, flag = sys.argv[1], sys.argv[2]
ep, val = None, None
for line in open(src + "/metrics.jsonl"):
    try: rec = json.loads(line)
    except ValueError: continue
    if "epoch" in rec: ep = max(ep or 0, int(rec["epoch"]))
    if "val_PSNR" in rec: val = rec["val_PSNR"]
open(flag + "/RESTORED.md", "w").write(
    f"Restored by tools/regen_bench_flagship.sh on "
    f"{datetime.date.today()}: shortened regen recipe (NOT the 220-epoch "
    f"comboext2 flagship, whose recipe is preserved as "
    f"recipe_comboext2_full.json). Installed weights: epoch {ep}, last "
    f"held-out val_PSNR {val and round(val, 2)} dB.\n")
EOF
echo INSTALLED
