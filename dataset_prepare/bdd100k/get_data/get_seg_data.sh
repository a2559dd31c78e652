#!/bin/bash
# Assemble the BDD100k 10k semantic-segmentation subset used for transfer
# evaluation (capability of reference get_data/get_seg_data.sh): unzip the
# `bdd100k_sem_seg_*` archives (downloaded from the official site) and lay
# out images/ + labels/ under <root>/bdd100k/seg.
# usage: get_seg_data.sh <bdd100k_root> [zips_dir]
set -eu
root="$1"
zips_dir="${2:-${root}/sem_seg_root}"
seg_root="${root}/bdd100k/seg"
mkdir -p "${seg_root}"

find "${zips_dir}" -maxdepth 1 -name 'bdd100k_*.zip' -print0 |
    xargs -0 -I{} unzip -oq {} -d "${zips_dir}"

cp -r "${zips_dir}/bdd100k/images/10k" "${seg_root}/images"
cp -r "${zips_dir}/bdd100k/labels/sem_seg/colormaps" "${seg_root}/labels"
