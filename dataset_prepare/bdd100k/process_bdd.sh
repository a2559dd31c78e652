#!/bin/bash
# Extract 10fps JPEG frames, one directory per video (capability of the
# reference's dataset_prepare/bdd100k/process_bdd.sh and
# get_data/create_img.sh, including its multi-node sharding: pass a 1-based
# start index and a count to split the sorted video list across nodes).
# usage: process_bdd.sh <video_dir> <out_dir> [parallel_jobs] [start] [count]

set -e
video_dir="$1"
out_dir="$2"
jobs="${3:-4}"
start="${4:-1}"
count="${5:-0}"   # 0 = all remaining

extract() {
    mov="$1"; out="$2"
    name="$(basename "${mov%.*}")"
    mkdir -p "${out}/${name}"
    ffmpeg -nostdin -loglevel error -i "${mov}" -r 10 -q:v 2 \
        "${out}/${name}/frame%05d.jpg"
}
export -f extract

list="$(find "${video_dir}" \( -name '*.mov' -o -name '*.mp4' \) | sort |
        tail -n +"${start}")"
if [ "${count}" -gt 0 ]; then
    list="$(echo "${list}" | head -n "${count}")"
fi
echo "${list}" | xargs -P "${jobs}" -I{} bash -c 'extract "$@"' _ {} "${out_dir}"
