#!/bin/bash
# Unzip all downloaded BDD100k video parts in parallel (capability of
# reference get_data/unzip_videos.sh).
# usage: unzip_videos.sh <bdd100k_root> [parallel_jobs]
set -eu
root="$1"
jobs="${2:-4}"
find "${root}" -maxdepth 1 -name 'bdd100k_videos_*.zip' -print0 |
    xargs -0 -P "${jobs}" -I{} unzip -oq {} -d "${root}"
