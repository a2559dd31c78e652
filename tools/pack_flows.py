#!/usr/bin/env python
"""Pack per-video flow files (.pth/.npy directories) into flowpack shards
served by the native mmap reader (see native/flowpack.cpp)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pixflow_tpu.data.flowpack import pack_flow_dir


def main():
    p = argparse.ArgumentParser("pack flow files into a flowpack shard")
    p.add_argument("flow_dir", help="directory of per-video .pth/.npy files")
    p.add_argument("out", help="output .fpk shard path")
    p.add_argument("--dtype", choices=["float16", "float32"],
                   default="float16")
    p.add_argument("--shards", type=int, default=1,
                   help="split into N shard files under OUT (a directory "
                        "when N>1) for per-host corpora")
    a = p.parse_args()
    pack_flow_dir(a.flow_dir, a.out, a.dtype, n_shards=a.shards)
    print(a.out)


if __name__ == "__main__":
    main()
