#!/usr/bin/env python
"""Convert a pretrain checkpoint to a detectron2 weight pickle (reference
`transfer/detection/convert_pretrain_to_d2.py`)."""

import argparse

from pixflow_tpu.eval import flax_resnet_to_d2
from pixflow_tpu.utils.checkpoint import load_published


def main():
    p = argparse.ArgumentParser("export backbone to detectron2")
    p.add_argument("ckpt", help="published checkpoint (.msgpack)")
    p.add_argument("out", help="output .pkl for detectron2")
    p.add_argument("--branch", choices=["online", "momentum"],
                   default="online", help="export the online or EMA encoder")
    a = p.parse_args()
    pub = load_published(a.ckpt)
    from pixflow_tpu.utils.checkpoint import select_branch
    all_p, all_s = select_branch(pub["params"], pub.get("batch_stats", {}),
                                 a.branch)
    params = all_p.get("encoder", all_p)
    stats = all_s.get("encoder", all_s)
    flax_resnet_to_d2(params, stats, a.out)
    print(a.out)


if __name__ == "__main__":
    main()
