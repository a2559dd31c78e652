"""Subprocess smoke of the public CLI: `python main_pretrain.py ...` runs a
real (tiny) pretraining end-to-end, exactly as a user would invoke it."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    rng = np.random.default_rng(9)
    for v in range(8):
        d = root / "train" / f"vid{v}"
        d.mkdir(parents=True)
        for f in range(2):
            Image.fromarray(rng.integers(0, 255, (48, 64, 3)).astype(
                np.uint8)).save(d / f"f{f}.jpg")
    return str(root)


def test_main_pretrain_cli(tiny_data, tmp_path):
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PIXFLOW_FORCE_CPU"] = "1"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ["
        f"'main_pretrain.py','--data-dir','{tiny_data}',"
        f"'--output-dir','{out}',"
        "'--dataset','bdd100k','--aug','NULL','--crop','0.5',"
        "'--image-size','64','--batch-size','1','--arch','resnet18',"
        "'--pixpro-p','2','--pixpro-transform-layer','1',"
        "'--epochs','1','--warmup-epoch','0','--print-freq','1',"
        "'--save-freq','1','--num-workers','1','--compute-dtype','float32'];"
        "import main_pretrain; main_pretrain.main()"
    )
    res = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=560)
    assert res.returncode == 0, res.stderr[-3000:]
    assert os.path.exists(os.path.join(out, "current.msgpack"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    with open(os.path.join(out, "config.json")) as f:
        assert json.load(f)["data"]["image_size"] == 64
    with open(os.path.join(out, "metrics.jsonl")) as f:
        rec = json.loads(f.readline())
    assert "loss" in rec and np.isfinite(rec["loss"])
    # per-direction pair telemetry (reference meters pos_1/pos_2 separately,
    # `main_pretrain.py:280-307`) plus the combined aggregates
    for key in ("pos_num_1", "pos_num_2", "pos_mean_1", "pos_mean_2",
                "pos_num", "pos_mean"):
        assert key in rec, key
    assert rec["pos_num"] == pytest.approx(
        rec["pos_num_1"] + rec["pos_num_2"])
