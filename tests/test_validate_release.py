"""Dry-run of the day-1 release-validation runbook (tools/validate_release.py).

The runbook's real purpose is the day released checkpoints + BDD100k reach a
machine (reference README.md:56-78); this test executes the --dry-run battery
on synthetic fixtures so the whole pipeline — torch checkpoint import (PixPro
+ RAFT), loss-curve comparison vs the live reference, linear probe, d2
export — stays runnable and cannot bit-rot.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_validate_release_dry_run(tmp_path):
    out = str(tmp_path / "vrel")
    env = dict(os.environ)
    env["VREL_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "validate_release.py"),
         "--dry-run", "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=1800, env=env)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    with open(os.path.join(out, "validate_report.json")) as f:
        report = json.load(f)
    assert report["summary"]["ok"]
    assert report["summary"]["fail"] == 0

    status = {r["stage"]: r["status"] for r in report["stages"]}
    # every stage with an executable fixture runs; only bdd_smoke lacks one
    assert status == {
        "import_pixpro": "PASS",
        "import_raft": "PASS",
        "loss_curve": "PASS",
        "linear_probe": "PASS",
        "d2_export": "PASS",
        "bdd_smoke": "SKIPPED",
    }

    detail = {r["stage"]: r["detail"] for r in report["stages"]}
    # the imported checkpoint round-trips structurally clean
    assert detail["import_pixpro"]["missing"] == []
    assert detail["import_pixpro"]["extra"] == []
    assert detail["import_pixpro"]["shape_mismatch"] == []
    # dry-run relaxes real-weights-only thresholds but must say so
    assert detail["import_raft"]["epe_thresholded"] is False
    assert detail["loss_curve"]["summary"]["value"] < 0.05
    # the published msgpack the later stages consumed exists on disk
    assert os.path.exists(detail["import_pixpro"]["published"])
    assert os.path.exists(detail["d2_export"]["pkl"])


def test_validate_release_stage_crash_is_a_fail_row(tmp_path):
    """The runbook's contract on unknown released artifacts: a stage that
    raises (here: a garbage .pth) becomes a FAIL row with the traceback
    tail, the battery keeps going, the report is still written, and the
    exit code is 1 — the process must never die reportless."""
    out = str(tmp_path / "vrel")
    bad = str(tmp_path / "garbage.pth")
    with open(bad, "wb") as f:
        f.write(b"not a torch checkpoint")
    env = dict(os.environ)
    env["VREL_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "validate_release.py"),
         "--pixpro-ckpt", bad, "--stages", "import_pixpro,d2_export",
         "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env)
    assert proc.returncode == 1, proc.stdout[-2000:] + proc.stderr[-2000:]

    with open(os.path.join(out, "validate_report.json")) as f:
        report = json.load(f)
    assert report["summary"]["ok"] is False
    assert report["summary"]["fail"] == 1
    status = {r["stage"]: r["status"] for r in report["stages"]}
    assert status["import_pixpro"] == "FAIL"
    assert status["d2_export"] == "SKIPPED"  # gated on the failed import
    assert status["loss_curve"] == "SKIPPED"  # not in --stages
    detail = {r["stage"]: r["detail"] for r in report["stages"]}
    assert "Traceback" in detail["import_pixpro"]["exception"]
