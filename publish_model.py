#!/usr/bin/env python
"""Strip training state from a checkpoint for release (reference
`publish_model.py`): keeps model params + BN stats, md5-stamps the filename."""

import argparse

from pixflow_tpu.utils import publish_checkpoint


def main():
    p = argparse.ArgumentParser("publish a pretrained checkpoint")
    p.add_argument("ckpt", help="input ckpt_epoch_N.msgpack / current.msgpack")
    p.add_argument("out", help="output path (hash suffix is appended)")
    p.add_argument("--branch", choices=["online", "momentum"],
                   default="online",
                   help="which encoder to publish under the online names: "
                        "the online branch (reference behavior) or the EMA "
                        "momentum branch")
    a = p.parse_args()
    final = publish_checkpoint(a.ckpt, a.out, branch=a.branch)
    print(final)


if __name__ == "__main__":
    main()
