#!/bin/bash
# Download the BDD100k video parts (70 train + 10 val zips from the public
# BDD mirror; capability of reference dataset_prepare/bdd100k/get_data/
# download_videos.sh + input.txt, with the URL list generated instead of
# committed).
# usage: download_videos.sh <bdd100k_root> [subset]   subset: all|train|val
set -eu
root="$1"
subset="${2:-all}"
mkdir -p "${root}"

base="http://dl.yf.io/bdd100k/video_parts"
list="$(mktemp)"
trap 'rm -f "${list}"' EXIT

if [ "${subset}" != "val" ]; then
    for i in $(seq -w 0 69); do
        echo "${base}/bdd100k_videos_train_${i}.zip" >> "${list}"
    done
fi
if [ "${subset}" != "train" ]; then
    for i in $(seq -w 0 9); do
        echo "${base}/bdd100k_videos_val_0${i}.zip" >> "${list}"
    done
fi

cd "${root}"
if command -v aria2c > /dev/null 2>&1; then
    aria2c -x16 -s16 --auto-file-renaming=false -i "${list}"
else
    wget -nc -i "${list}"
fi
