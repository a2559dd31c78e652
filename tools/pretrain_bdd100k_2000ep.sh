#!/bin/bash
# PixPro baseline on BDD100k, 2000 epochs, no optical flow
# (counterpart of reference tools/pretrain_bdd100k_job_2000ep.sh: global batch
# 1024, n_frames 1, mixed precision). On TPU the global batch is
# per-replica batch x mesh size; run on 8+ chips for batch 1024.

set -e
data_dir="${DATA_DIR:-./data/bdd100k/images/track/bdd100k/images/track}"
output_dir="${OUTPUT_DIR:-./output/pixpro_bdd100k_2000ep}"

python main_pretrain.py \
    --recipe pretrain_bdd100k_2000ep \
    --data-dir "${data_dir}" \
    --output-dir "${output_dir}" \
    --auto-resume \
    "$@"
