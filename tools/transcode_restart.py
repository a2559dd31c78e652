#!/usr/bin/env python
"""Losslessly transcode a JPEG corpus with per-MCU-row restart markers.

Restart intervals make each MCU row independently entropy-decodable, so the
native ROI decoder (native/jpegroi.cpp) can splice out just the rows a crop
touches instead of Huffman-decoding everything above the band — the measured
host-pipeline floor (docs/PERF.md). The transcode is coefficient-domain
(jpegtran-style): identical pixels, ~0.05-0.5% larger files, run once at
data-prep time. Mirrors the role of the reference's BDD preprocessing step
(/root/reference/dataset_prepare/bdd100k/process_bdd.sh) in our pipeline.

Usage:
  python tools/transcode_restart.py DATA_DIR            # in place
  python tools/transcode_restart.py DATA_DIR --out OUT  # mirrored tree
  python tools/transcode_restart.py DATA_DIR --workers 8
"""

from __future__ import annotations

import argparse
import os
import sys
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _one(job):
    src, dst = job
    from pixflow_tpu.data.jpegroi import restart_rows, transcode_restart
    with open(src, "rb") as f:
        data = f.read()
    if restart_rows(data) > 0:  # already splice-compatible
        if dst != src:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(dst, "wb") as f:
                f.write(data)
        return (len(data), len(data), "skip")
    try:
        out = transcode_restart(data)
    except ValueError:
        # keep the mirrored corpus complete: copy the original bytes (the
        # decoder auto-falls back on non-restart streams), report the path
        if dst != src:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(dst, "wb") as f:
                f.write(data)
        return (len(data), len(data), "fail", src)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, dst)
    return (len(data), len(out), "ok")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("data_dir")
    ap.add_argument("--out", default="",
                    help="mirror tree root (default: transcode in place)")
    ap.add_argument("--workers", type=int, default=os.cpu_count())
    a = ap.parse_args()

    jobs = []
    for root, _, files in os.walk(a.data_dir):
        for name in files:
            if not name.lower().endswith((".jpg", ".jpeg")):
                continue
            src = os.path.join(root, name)
            dst = (os.path.join(a.out, os.path.relpath(src, a.data_dir))
                   if a.out else src)
            jobs.append((src, dst))
    print(f"{len(jobs)} JPEGs under {a.data_dir}")

    if a.workers > 1 and len(jobs) > 1:
        with Pool(a.workers) as pool:
            results = pool.map(_one, jobs, chunksize=16)
    else:
        results = [_one(j) for j in jobs]

    n_ok = sum(r[2] == "ok" for r in results)
    n_skip = sum(r[2] == "skip" for r in results)
    failed = [r[3] for r in results if r[2] == "fail"]
    before = sum(r[0] for r in results)
    after = sum(r[1] for r in results)
    growth = (after - before) / max(before, 1) * 100
    print(f"transcoded {n_ok}, already-aligned {n_skip}, "
          f"failed {len(failed)}; "
          f"size {before/1e6:.1f} -> {after/1e6:.1f} MB ({growth:+.2f}%)")
    for path in failed:
        print(f"FAILED (copied verbatim): {path}" if a.out
              else f"FAILED (left untouched): {path}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
