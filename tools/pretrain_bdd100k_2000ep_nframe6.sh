#!/bin/bash
# PixPro + optical flow, 6-frame window, 2000 epochs (counterpart of
# reference tools/pretrain_bdd100k_job_2000ep_nframe6_gpu16.sh: global batch
# 1024, precomputed RAFT-small flow files, cycle mask a1=0.01 a2=0.5).
#
# TPU-native default composes the 5-flow long-range warp at the stored 1/8
# flow resolution (the loss rescales per the resolution ratio). Pass
# FLOW_UP=1 for the reference's upflow8-then-compose parity mode (slower).

set -e
data_dir="${DATA_DIR:-./data/bdd100k/images/track/bdd100k/images/track}"
flow_root="${FLOW_ROOT:-}"
output_dir="${OUTPUT_DIR:-./output/pixpro_flow_bdd100k_2000ep_nframe6}"

extra=()
[ "${FLOW_UP:-0}" = "1" ] && extra+=(--flow_up)
[ -n "${flow_root}" ] && extra+=(--flow_root "${flow_root}")

python main_pretrain.py \
    --recipe pretrain_bdd100k_2000ep_nframe6 \
    --data-dir "${data_dir}" \
    --output-dir "${output_dir}" \
    --auto-resume \
    "${extra[@]}" \
    "$@"
