"""Bounded fuzz run over the native decode runtime (tools/fuzz_native.py).

The native libraries parse untrusted bytes inside forked loader workers;
the contract is "succeed or raise the binding's Python error — never
crash". A short deterministic run is wired into the suite; longer soaks
(and the -fsanitize=address,undefined variant) run via the CLI:

    python tools/fuzz_native.py --iters 20000 --asan
"""

import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _write_pack(tmp_path):
    import numpy as np
    from pixflow_tpu.data.flowpack import write_flowpack

    p = str(tmp_path / "t.fpk")
    vids = [(f"v{i}", np.full((3, 4, 6, 2), float(i), np.float32))
            for i in range(3)]
    write_flowpack(p, vids, dtype="float32")
    return p


def test_flowpack_truncated_index_rejected(tmp_path):
    """A pack whose advertised index extends past EOF must fail open()
    cleanly (native/flowpack.cpp header validation)."""
    from pixflow_tpu.data.flowpack import FlowPackReader
    import pytest

    p = _write_pack(tmp_path)
    data = open(p, "rb").read()
    # keep the 32-byte header + half of the first 80-byte index entry
    bad = str(tmp_path / "trunc.fpk")
    with open(bad, "wb") as f:
        f.write(data[:32 + 40])
    with pytest.raises(FileNotFoundError):
        FlowPackReader(bad)


def test_flowpack_zero_name_len_rejected(tmp_path):
    from pixflow_tpu.data.flowpack import FlowPackReader
    import pytest

    p = _write_pack(tmp_path)
    data = bytearray(open(p, "rb").read())
    data[24:28] = (0).to_bytes(4, "little")  # name_len = 0
    bad = str(tmp_path / "nl0.fpk")
    with open(bad, "wb") as f:
        f.write(bytes(data))
    with pytest.raises(FileNotFoundError):
        FlowPackReader(bad)


def test_flowpack_stomped_offset_rejected_at_open(tmp_path):
    """An index offset pointing past the data region must fail the OPEN:
    fp_open validates every entry's [offset, offset + num_flows*flow_bytes)
    window against the data region, so a corrupt index can never reach a
    read (which also makes fp_read's u64 arithmetic provably wrap-free)."""
    from pixflow_tpu.data.flowpack import FlowPackReader
    import pytest

    p = _write_pack(tmp_path)
    data = bytearray(open(p, "rb").read())
    # entry 0's u64 offset lives at 32 + name_len(64) = 96
    data[96:104] = (2 ** 62).to_bytes(8, "little")
    bad = str(tmp_path / "off.fpk")
    with open(bad, "wb") as f:
        f.write(bytes(data))
    with pytest.raises(FileNotFoundError):
        FlowPackReader(bad)


def test_flowpack_huge_dims_rejected_at_open(tmp_path):
    """A well-formed header advertising giant h*w must fail the open (the
    65536 dimension cap): the Python binding would otherwise np.empty a
    multi-GB buffer before the first read bound check."""
    from pixflow_tpu.data.flowpack import FlowPackReader
    import pytest

    p = _write_pack(tmp_path)
    data = bytearray(open(p, "rb").read())
    data[12:16] = (1 << 20).to_bytes(4, "little")  # h = 1M
    bad = str(tmp_path / "hugedims.fpk")
    with open(bad, "wb") as f:
        f.write(bytes(data))
    with pytest.raises(FileNotFoundError):
        FlowPackReader(bad)


def test_flowpack_oversized_window_rejected_before_alloc(tmp_path):
    """read() must bound the requested window against the video BEFORE
    allocating the output buffer."""
    from pixflow_tpu.data.flowpack import FlowPackReader
    import pytest

    r = FlowPackReader(_write_pack(tmp_path))
    try:
        n = r.num_flows(0)
        with pytest.raises(IndexError):
            r.read(0, 0, n + 1)
        with pytest.raises(IndexError):
            r.read(0, -1, 1)
    finally:
        r.close()


def test_jpegroi_overflow_box_rejected():
    """x + w near INT_MAX must be rejected (long-widened compare), not
    wrap into an accepted box."""
    import io

    import numpy as np
    import pytest
    from PIL import Image

    from pixflow_tpu.data import jpegroi

    buf = io.BytesIO()
    Image.fromarray(np.zeros((32, 48, 3), np.uint8)).save(
        buf, "JPEG", quality=90)
    data = buf.getvalue()
    with pytest.raises(ValueError):
        jpegroi.decode_crop_resize(
            data, (2 ** 31 - 8, 0, 2 ** 31 - 8, 8), (8, 8))


def test_fuzz_native_bounded():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fuzz_native.py"),
         "--iters", "300", "--seed", "1"],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert proc.returncode == 0, \
        f"fuzzer found a crash or contract violation:\n{proc.stdout}\n{proc.stderr}"
    assert "no findings" in proc.stdout or "clean" in proc.stdout
