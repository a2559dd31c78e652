#!/bin/bash
# Extract 10fps JPEG frames, one directory per video (capability of the
# reference's dataset_prepare/bdd100k/process_bdd.sh).
# usage: process_bdd.sh <video_dir> <out_dir> [parallel_jobs]

set -e
video_dir="$1"
out_dir="$2"
jobs="${3:-4}"

extract() {
    mov="$1"; out="$2"
    name="$(basename "${mov%.*}")"
    mkdir -p "${out}/${name}"
    ffmpeg -nostdin -loglevel error -i "${mov}" -r 10 -q:v 2 \
        "${out}/${name}/frame%05d.jpg"
}
export -f extract

find "${video_dir}" -name '*.mov' -o -name '*.mp4' | \
    xargs -P "${jobs}" -I{} bash -c 'extract "$@"' _ {} "${out_dir}"
