#!/bin/bash
# Linear probe of a pretrained backbone (counterpart of reference
# tools-style main_linear.py invocation: frozen backbone, SGD lr 30, wd 0).
set -e
python main_linear.py \
    --data-dir "${DATA_DIR:-./data/imagenet}" \
    --pretrained-model "${PRETRAINED:?set PRETRAINED=path/to/published.msgpack}" \
    --output-dir "${OUTPUT_DIR:-./output/linear}" \
    "$@"
