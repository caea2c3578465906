#!/bin/bash
# Round-5 endgame (takes over from queue.sh after its 07:45 relaunch skipped
# the flagship eval/promotion behind the `before 16000` deadline gate).
# Sequential TPU chain, flagship-critical work first:
#   1. holdout-eval e2e_flagext2 (ep219, val 33.07) with --no_ema — the run
#      was killed mid final save, so latest_net_G_ema is ~35 epochs stale;
#      raw G is the honest track (EMA measured neutral in round 4).
#   2. promote to checkpoints/flagship with self-describing provenance
#      (VERDICT r4 weak #2): metrics.jsonl + opt.txt + RESTORED.md move with
#      the weights; the stale G_ema/state are NOT installed.
#   3. bench.py smoke on the promoted flagship (VERDICT r4 #1 done-gate).
#   4. holdout-eval the e2e_msuv arm (VERDICT #4's measured 512px delta).
# Everything is bounded so the chip is free well before the 10:30 driver
# deadline.
set -x
cd "$(dirname "$0")/../.."
ROOT=$(pwd)
R5=/tmp/r5run
D=/tmp/r4/data
CKPT=$ROOT/checkpoints/r5
FLAG=$ROOT/checkpoints/flagship
PY=python
SIZING="--ngf 64 --n_blocks_translate 9 --n_downsample_translate 4 --ngf_global 48 --n_blocks_global 10 --n_downsample_global 2 --n_blocks_bg 2 --n_downsample_bg 2 --loadSize 512 --tex_tile 64"

# wait for the msuv trainer's final save to land (single-process chip)
while ps -p "$(cat /tmp/r5_msuv_train.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do sleep 15; done

eval_arm () {  # $1 run name, rest extra flags -> $R5/arm_$1.json
  local arm=$1; shift
  timeout 2400 $PY test.py --name $arm --checkpoints_dir $CKPT \
    --pose_path $D/holdout_json --bg_path $D/bg.jpg \
    --texture_path $D/texture.png --results_dir $R5/renders_$arm \
    --which_epoch latest --target_shape 512,512 --phase test \
    $SIZING "$@" > $R5/${arm}_test.log 2>&1 || return 1
  timeout 900 $PY evaluate.py --results_dir $R5/renders_$arm/images \
    --gt_dir $D/holdout_gt --loadSize 512 --no_vgg --metric temporal \
    --out $R5/arm_${arm}.json >> $R5/${arm}_test.log 2>&1
}

# ---- 1. flagship holdout eval (raw G; see header) ----
if [ ! -f $R5/arm_e2e_flagext2.json ]; then
  eval_arm e2e_flagext2 --pose_heatmaps --coord_conv --no_ema || exit 1
fi
echo FLAG-EVAL-DONE

# ---- 2. promote on the >=31 dB holdout gate ----
if $PY -c "import json,sys; sys.exit(0 if json.load(open('$R5/arm_e2e_flagext2.json'))['psnr']>=31.0 else 1)"; then
  SRC=$CKPT/e2e_flagext2
  $PY tools/round5/dedup_metrics.py $SRC >> $R5/dedup.log 2>&1
  [ -f $FLAG/recipe_comboext2_full.json ] || cp $FLAG/recipe.json $FLAG/recipe_comboext2_full.json
  # stale-on-purpose exclusions: latest_net_G_ema (ep~185) + latest_state
  # (ep~200) were written by earlier save cycles; installing them would pair
  # mismatched tracks with the ep219 G/D (ADVICE r4 finding 3 class).
  rm -f $FLAG/latest_net_G_ema.msgpack $FLAG/latest_state.msgpack
  for f in latest_net_G.msgpack latest_net_D.msgpack latest_net_TransG.msgpack \
           recipe.json opt.txt metrics.jsonl; do
    cp $SRC/$f $FLAG/ || echo "WARN: $SRC/$f absent"
  done
  cp $R5/arm_e2e_flagext2.json $ROOT/docs/quality/r5_flagship.json
  $PY - $SRC $FLAG $R5/arm_e2e_flagext2.json <<'EOF'
import json, sys, datetime
src, flag, armf = sys.argv[1:4]
ep = val = None
for line in open(src + "/metrics.jsonl"):
    try: rec = json.loads(line)
    except ValueError: continue
    if "epoch" in rec: ep = max(ep or 0, int(rec["epoch"]))
    if "val_PSNR" in rec: val = rec["val_PSNR"]
hold = json.load(open(armf))
open(flag + "/RESTORED.md", "w").write(
    f"Full flagship replay (comboext2 recipe, three segments) installed "
    f"{datetime.date.today()} by tools/round5/finish.sh. The final segment "
    f"was killed by its own timeout mid final-save at epoch {ep}/220, so the "
    f"installed latest_net_G/D/TransG are the epoch-{ep} save and the stale "
    f"mid-run G_ema/state files are intentionally NOT installed (EMA was "
    f"measured quality-neutral on this corpus in round 4 — "
    f"docs/quality/r4_arms_512px.json). Final val_PSNR {round(val,2)} dB; "
    f"holdout (raw G, 10 frames) PSNR {round(hold['psnr'],2)} / "
    f"SSIM {round(hold['ssim'],4)}.\n")
EOF
  echo FLAGSHIP-PROMOTED
else
  echo FLAGSHIP-GATE-FAILED; exit 1
fi

# ---- 3. bench smoke on the promoted flagship ----
timeout 1500 $PY bench.py > $R5/bench_smoke.json 2> $R5/bench_smoke.log \
  && echo BENCH-SMOKE-DONE || echo BENCH-SMOKE-FAILED
tail -c 400 $R5/bench_smoke.json

# ---- 4. msuv arm holdout eval ----
if [ ! -f $R5/arm_e2e_msuv.json ]; then
  eval_arm e2e_msuv --pose_heatmaps --coord_conv --ms_uv 2 || echo MSUV-EVAL-FAILED
fi
echo MSUV-EVAL-DONE

echo R5-FINISH-DONE
