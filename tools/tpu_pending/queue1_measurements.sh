#!/bin/bash
# Pending TPU work queue (runs once when the relay returns) — round 3
set -x
cd /root/repo
Q=/tmp/quality
FLAGS="--ngf 64 --n_blocks_translate 9 --n_downsample_translate 4 --ngf_global 48 --n_blocks_global 10 --n_downsample_global 2 --n_blocks_bg 2 --n_downsample_bg 2 --loadSize 512 --tex_tile 64"
# 1. selftest on current HEAD (sanity after review fixes + bf16 kernel)
timeout 3000 python tools/tpu_selftest.py > /tmp/selftest3.log 2>&1
# 2. headline bench re-measure on HEAD (exact kernel) -> the BENCH_r03 number
timeout 3000 python bench.py > /tmp/bench_head.log 2>&1
# 3. bf16 warp-kernel bench (the round-3 candidate win)
timeout 3000 python bench.py --warp_dtype bfloat16 > /tmp/bench_bf16.log 2>&1
# 4. trained-regime bench under warp_eps default
timeout 3000 python bench.py --ckpt $Q/ckpt/e2e_tempreal --tex_tile 64 > /tmp/bench_eps_trained2.log 2>&1
# 5. trained-regime + bf16 combined
timeout 3000 python bench.py --ckpt $Q/ckpt/e2e_tempreal --tex_tile 64 --warp_dtype bfloat16 > /tmp/bench_eps_bf16.log 2>&1
# 6. cross-person transfer parity with the epoch-100 checkpoint
timeout 3000 python test.py --name e2e_tempreal --checkpoints_dir $Q/ckpt --pose_path /tmp/xfer/aligned \
  --bg_path $Q/data/bg.jpg --texture_path $Q/data/texture.png \
  --results_dir /tmp/xfer/renders_ep100 --which_epoch latest --target_shape 512,512 \
  --phase test $FLAGS > /tmp/xfer_ep100.log 2>&1
timeout 1200 python evaluate.py --results_dir /tmp/xfer/renders_ep100/images --gt_dir $Q/data/frames \
  --loadSize 512 --no_vgg --metric lpips --out /tmp/xfer/transfer_parity_ep100.json >> /tmp/xfer_ep100.log 2>&1
# 7. serving artifact re-export on current kernel defaults
timeout 3000 python tools/export_serving.py --name e2e_tempreal --checkpoints_dir $Q/ckpt \
  --which_epoch latest --batch 8 --out /tmp/model512_eps.jaxexport $FLAGS > /tmp/export_eps.log 2>&1
# 8. quality decomposition profile of the ep100 checkpoint
timeout 3000 python tools/quality_profile.py --data $Q/data --run_dir $Q/ckpt/e2e_tempreal \
  --how_many 6 --out /tmp/qprof512.json -- $FLAGS > /tmp/qprof512.log 2>&1
# 9. per-line step profile on HEAD
timeout 3000 python tools/profile_step.py > /tmp/profile_eps.log 2>&1
echo TPU-QUEUE-DONE
