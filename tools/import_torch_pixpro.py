#!/usr/bin/env python
"""Convert a reference PixPro torch checkpoint (published weights) into a
published pixflow-tpu checkpoint usable by main_linear.py /
convert_pretrain_to_d2.py."""

import argparse
import json

from flax import serialization

from pixflow_tpu.models.convert_pixpro import load_torch_pixpro


def main():
    p = argparse.ArgumentParser("import a torch PixPro checkpoint")
    p.add_argument("ckpt", help="reference .pth checkpoint")
    p.add_argument("out", help="output published .msgpack")
    a = p.parse_args()
    variables = load_torch_pixpro(a.ckpt)
    published = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "epoch": -1,
        "config": json.dumps({"imported_from": a.ckpt}),
    }
    with open(a.out, "wb") as f:
        f.write(serialization.msgpack_serialize(published))
    print(a.out)


if __name__ == "__main__":
    main()
