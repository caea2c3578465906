#!/bin/bash
# Round-5 second-window queue, part C. queue_b's first regen attempt died on
# the relay first-fetch flake (stage-1 hung at its first blocking device
# fetch, iter-50 loss print, after running 45 async steps — the same flake
# class bench.py retries around); the noisyab item was already running, so
# this part waits for it and then re-runs the regen→bench→lc64 chain in the
# right priority order. Usage: bash queue_c.sh <noisyab_pid>
set -x
cd "$(dirname "$0")/../.."
ROOT=$(pwd)
echo $$ > /tmp/r5c_queue.pid
OUT=/tmp/r5b
HARD_END=${HARD_END:-$(( $(date +%s) + 10200 ))}
before () { [ "$(date +%s)" -lt $(( HARD_END - $1 )) ]; }

# ---- 0. wait for the in-flight noisyab (pid passed in) ----
NAB=$1
while [ -n "$NAB" ] && kill -0 "$NAB" 2>/dev/null; do sleep 30; done
if [ -f $OUT/noisyab512/noisy_gt_ab.json ]; then
  cp $OUT/noisyab512/noisy_gt_ab.json $ROOT/docs/quality/noisy_gt_ab_512px.json
  echo NOISYAB512-DONE
fi

# ---- 1. regen the trained flagship (retry; relay flake is per-process) ----
if [ ! -f $ROOT/checkpoints/flagship/latest_net_G.msgpack ] && before 2400; then
  bash tools/regen_bench_flagship.sh > /tmp/regen_main2.log 2>&1 \
    && echo REGEN-DONE || echo REGEN-FAILED
fi

# ---- 2. bench on whatever regime is now installed ----
if before 900; then
  timeout 1800 python bench.py > $OUT/bench1.json 2> $OUT/bench1.log \
    && cp $OUT/bench1.json $ROOT/docs/perf/bench_r5b_trained.json \
    && echo BENCH1-DONE
fi

# ---- 3. --limb_coords 64px measured gate ----
if [ ! -f $ROOT/docs/quality/limb_coords_64px.json ] && before 1800; then
  timeout 3000 python tools/round5/arm_ab64.py --name limb_coords \
    --arm_flags "--limb_coords" --arm_kw '{"limb_coords": true}' \
    --out $ROOT/docs/quality/limb_coords_64px.json \
    > $OUT/lc64.log 2>&1 && echo LC64-DONE
fi

# ---- 4. second independent bench run ----
if before 500; then
  timeout 1500 python bench.py > $OUT/bench2.json 2> $OUT/bench2.log \
    && cp $OUT/bench2.json $ROOT/docs/perf/bench_r5b_validate.json \
    && echo BENCH2-DONE
fi

touch $OUT/QUEUE_C_DONE
echo R5C-QUEUE-DONE
