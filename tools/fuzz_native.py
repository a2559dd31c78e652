#!/usr/bin/env python
"""Fuzz harness for the native decode runtime (native/jpegroi.cpp,
native/flowpack.cpp).

Both libraries parse UNTRUSTED bytes inside forked loader workers — a crash
there kills a training job, and heap corruption is silent data damage. The
reference has no native code to harden (`contrast/data/dataset.py` leans on
PIL); ours does, so it gets a fuzzer. Strategy: build a small corpus of
valid artifacts, apply random structural mutations (truncate / bit-flip /
splice / overwrite), and drive every C entry point through the real ctypes
bindings. The contract under test: every call either succeeds with a
well-formed result or raises the binding's Python error — the process never
crashes, and (checked under --asan) never touches memory out of bounds.

Usage:
  python tools/fuzz_native.py --iters 2000 --seed 0        # plain
  python tools/fuzz_native.py --iters 2000 --asan          # sanitizer build

--asan rebuilds the libraries with -fsanitize=address,undefined into
native/asan/, re-execs this process with the sanitizer runtimes LD_PRELOADed
(a shared library cannot statically link ASan), and points the bindings at
the instrumented .so files. Exit code 0 = no findings.

A bounded run of this harness is wired into the test suite
(tests/test_fuzz_native.py); this CLI is for longer soak runs.
"""

from __future__ import annotations

import argparse
import io
import os
import random
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
NATIVE_DIR = os.path.join(REPO, "native")


# ---------------------------------------------------------------- corpus

def make_jpeg_corpus(rng: random.Random) -> list:
    """Valid JPEGs spanning the shapes the pipeline sees: sizes, qualities,
    chroma subsampling, progressive, and restart-transcoded variants."""
    from PIL import Image

    corpus = []
    specs = [
        ((96, 64), 85, 2, False),     # 4:2:0 (BDD frames)
        ((160, 120), 50, 0, False),   # 4:4:4 low quality
        ((130, 94), 95, 1, False),    # 4:2:2, non-MCU-aligned dims
        ((64, 64), 85, 2, True),      # progressive (splice must refuse)
        ((320, 240), 85, 2, False),
    ]
    for (w, h), q, subs, prog in specs:
        arr = np.indices((h, w)).sum(0)
        img = Image.merge("RGB", [
            Image.fromarray(((arr + i * 37) % 256).astype(np.uint8))
            for i in range(3)])
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=q, subsampling=subs, progressive=prog)
        corpus.append(buf.getvalue())
    # restart-transcoded variants (the splice fast path's input format)
    from pixflow_tpu.data import jpegroi
    for data in corpus[:3]:
        try:
            corpus.append(jpegroi.transcode_restart(data, rows=1))
        except ValueError:
            pass
    return corpus


def make_flowpack_corpus(rng: random.Random, tmpdir: str) -> list:
    """Valid .fpk shard files (bytes) at a couple of shapes/dtypes."""
    from pixflow_tpu.data.flowpack import write_flowpack

    paths = []
    for i, (h, w, dt) in enumerate([(12, 20, "float16"), (8, 8, "float32")]):
        vids = [(f"vid{j:03d}", np.random.RandomState(j).randn(
            rng.randint(1, 6), h, w, 2).astype(np.float32))
            for j in range(4)]
        p = os.path.join(tmpdir, f"fuzz_seed_{i}.fpk")
        write_flowpack(p, vids, dtype=dt)
        paths.append(p)
    return [open(p, "rb").read() for p in paths]


# ------------------------------------------------------------- mutations

def mutate(data: bytes, rng: random.Random) -> bytes:
    """0-3 random structural mutations."""
    b = bytearray(data)
    for _ in range(rng.randint(0, 3)):
        if not b:
            break
        op = rng.randrange(6)
        if op == 0:  # truncate
            b = b[: rng.randrange(1, len(b) + 1)]
        elif op == 1:  # bit flips
            for _ in range(rng.randint(1, 32)):
                i = rng.randrange(len(b))
                b[i] ^= 1 << rng.randrange(8)
        elif op == 2:  # overwrite a slice with random bytes
            i = rng.randrange(len(b))
            n = min(len(b) - i, rng.randint(1, 64))
            b[i:i + n] = bytes(rng.getrandbits(8) for _ in range(n))
        elif op == 3:  # delete a slice
            i = rng.randrange(len(b))
            n = min(len(b) - i, rng.randint(1, 64))
            del b[i:i + n]
        elif op == 4:  # duplicate a slice
            i = rng.randrange(len(b))
            n = min(len(b) - i, rng.randint(1, 64))
            b[i:i] = b[i:i + n]
        else:  # int-field stomp: plant an extreme u32 at a random offset
            if len(b) >= 4:
                i = rng.randrange(len(b) - 3)
                v = rng.choice([0, 1, 0x7FFFFFFF, 0xFFFFFFFF, 0x80000000,
                                rng.getrandbits(32)])
                b[i:i + 4] = int(v).to_bytes(4, "little")
    return bytes(b)


def wild_int(rng: random.Random) -> int:
    return rng.choice([0, -1, 1, 7, 224, 65535, -(2 ** 31), 2 ** 31 - 1,
                       rng.randint(-10**6, 10**6)])


# ---------------------------------------------------------------- drivers

def fuzz_jpegroi_once(corpus, rng: random.Random):
    from pixflow_tpu.data import jpegroi

    data = mutate(rng.choice(corpus), rng)
    op = rng.randrange(4)
    try:
        if op == 0:
            w, h = jpegroi.jpeg_size(data)
            assert 0 < w <= 65535 and 0 < h <= 65535
        elif op == 1:
            r = jpegroi.restart_rows(data)
            assert isinstance(r, int)
        elif op == 2:
            if rng.random() < 0.7:
                # plausible box (may still exceed the mutated image's dims)
                x, y = rng.randint(0, 300), rng.randint(0, 300)
                bw, bh = rng.randint(1, 300), rng.randint(1, 300)
            else:
                x, y, bw, bh = (wild_int(rng) for _ in range(4))
            out = rng.choice([(32, 32), (224, 224), (7, 13)])
            px = jpegroi.decode_crop_resize(data, (x, y, bw, bh), out,
                                            max_denom=rng.choice([1, 2, 8]))
            assert px.shape == (out[1], out[0], 3)
        else:
            blob = jpegroi.transcode_restart(data, rows=rng.choice([1, 2, 8]))
            # a successful transcode must itself decode to the same size
            assert jpegroi.jpeg_size(blob) == jpegroi.jpeg_size(data)
    except ValueError:
        pass  # the defined failure mode


def fuzz_flowpack_once(corpus, rng: random.Random, tmpdir: str):
    from pixflow_tpu.data.flowpack import FlowPackReader

    data = mutate(rng.choice(corpus), rng)
    path = os.path.join(tmpdir, "mut.fpk")
    with open(path, "wb") as f:
        f.write(data)
    try:
        reader = FlowPackReader(path)
    except FileNotFoundError:
        return  # clean rejection
    try:
        n = len(reader)
        assert 0 <= n
        for _ in range(3):
            idx = rng.randrange(max(n, 1)) if rng.random() < 0.7 \
                else wild_int(rng)
            k = reader.num_flows(idx)
            start = rng.randint(0, 4) if rng.random() < 0.7 \
                else wild_int(rng)
            cnt = rng.randint(0, 4)
            # no allocation guard needed: fp_open caps h/w at 65536 and
            # validates every index entry against the data region, and the
            # binding bounds the window against num_flows before np.empty —
            # a mutated pack can no longer drive a huge host allocation
            try:
                arr = reader.read(idx, start, cnt)
                assert arr.shape == (cnt, reader.h, reader.w, 2)
            except (IndexError, KeyError):
                pass
            assert isinstance(k, int)
    finally:
        reader.close()


def run_fuzz(iters: int, seed: int) -> None:
    import tempfile

    rng = random.Random(seed)
    with tempfile.TemporaryDirectory() as td:
        jc = make_jpeg_corpus(rng)
        fc = make_flowpack_corpus(rng, td)
        # sanity: unmutated corpus must always succeed
        from pixflow_tpu.data import jpegroi
        from pixflow_tpu.data.flowpack import FlowPackReader
        for d in jc:
            w, h = jpegroi.jpeg_size(d)
            px = jpegroi.decode_crop_resize(
                d, (1, 1, min(48, w - 1), min(40, h - 1)), (16, 16))
            assert px.shape == (16, 16, 3)
        for d in fc:
            p = os.path.join(td, "ok.fpk")
            with open(p, "wb") as f:
                f.write(d)
            r = FlowPackReader(p)
            assert len(r) == 4 and r.read(0, 0, 1).shape[0] == 1
            r.close()

        for i in range(iters):
            fuzz_jpegroi_once(jc, rng)
            fuzz_flowpack_once(fc, rng, td)
            if (i + 1) % 500 == 0:
                print(f"  {i + 1}/{iters} iterations, no findings")
    print(f"fuzz_native: {iters} iterations x 2 targets clean "
          f"(seed {seed})")


# ------------------------------------------------------------------ asan

def reexec_with_asan() -> None:
    """Build sanitizer .so files, then re-exec with runtimes preloaded and
    the bindings pointed at native/asan/."""
    subprocess.run(["make", "-C", NATIVE_DIR, "asan"], check=True)
    preload = []
    for lib in ("libasan.so", "libubsan.so"):
        p = subprocess.run(["g++", f"-print-file-name={lib}"],
                           capture_output=True, text=True).stdout.strip()
        if p and os.path.sep in p:
            preload.append(p)
    env = dict(os.environ)
    env["LD_PRELOAD"] = ":".join(preload)
    # leak checking off: CPython itself reports thousands of suppressable
    # "leaks" at exit; we are after OOB/UAF/overflow, which still abort
    env["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=1"
    env["FUZZ_NATIVE_DIR"] = os.path.join(NATIVE_DIR, "asan")
    env["FUZZ_ASAN_CHILD"] = "1"
    args = [a for a in sys.argv if a != "--asan"]
    os.execve(sys.executable, [sys.executable] + args, env)


def patch_native_dir() -> None:
    """Point both bindings at FUZZ_NATIVE_DIR before anything loads them."""
    d = os.environ.get("FUZZ_NATIVE_DIR")
    if not d:
        return
    from pixflow_tpu.data import flowpack, jpegroi
    jpegroi._native_dir = lambda: d
    flowpack._native_dir = lambda: d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--asan", action="store_true",
                    help="run against -fsanitize=address,undefined builds")
    args = ap.parse_args()
    if args.asan and not os.environ.get("FUZZ_ASAN_CHILD"):
        reexec_with_asan()
    patch_native_dir()
    run_fuzz(args.iters, args.seed)


if __name__ == "__main__":
    main()
