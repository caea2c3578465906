#!/bin/bash
# Cross-person pose retargeting (reference: data/data_prep/run_alignPose.sh).
python3 graph_posenorm.py \
    --target_keypoints ${TGT:?set TGT=<target keypoints dir>} \
    --source_keypoints ${SRC:?set SRC=<source keypoints dir>} \
    --target_shape 1024 1024 3 \
    --source_shape 1024 1024 3 \
    --results ${OUT:?set OUT=<output dir>} \
    --target_spread 400 800 \
    --source_spread 400 800 \
    --calculate_scale_translation
