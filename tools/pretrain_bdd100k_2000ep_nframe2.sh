#!/bin/bash
# PixPro + optical flow, 2-frame window, 2000 epochs (counterpart of
# reference tools/pretrain_bdd100k_job_2000ep_nframe2_gpu16.sh: global batch
# 1024, precomputed RAFT-small flow files, cycle mask a1=0.01 a2=0.5).
#
# Default = the reference's FLOW_UP=y full-resolution composition, computed
# lazily at the loss's bin centers (exact same numbers, and the fastest mode
# on TPU). Pass FLOW_UP=0 to compose at the stored 1/8 flow resolution
# instead (a TPU-era variant; the loss rescales per the resolution ratio).

set -e
data_dir="${DATA_DIR:-./data/bdd100k/images/track/bdd100k/images/track}"
flow_root="${FLOW_ROOT:-}"
output_dir="${OUTPUT_DIR:-./output/pixpro_flow_bdd100k_2000ep_nframe2}"

extra=()
[ "${FLOW_UP:-1}" = "0" ] && extra+=(--no-flow_up)
[ -n "${flow_root}" ] && extra+=(--flow_root "${flow_root}")

python main_pretrain.py \
    --recipe pretrain_bdd100k_2000ep_nframe2 \
    --data-dir "${data_dir}" \
    --output-dir "${output_dir}" \
    --auto-resume \
    "${extra[@]}" \
    "$@"
