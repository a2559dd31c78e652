#!/usr/bin/env python
"""Day-1 real-data validation runbook: one command, one report.

When the released artifacts finally materialize on a machine (the published
PixPro checkpoints and raft-small.pth from the reference's README.md:56-60,
BDD100k frames, an ImageNet-style labeled tree), this runs the whole
acceptance battery against them:

  import_pixpro  torch PixPro checkpoint -> flax trees; PASS = the imported
                 tree is structurally identical (key sets + shapes) to a
                 fresh PixPro init and a probe forward is finite; writes the
                 published .msgpack used by the later stages.
  import_raft    torch RAFT checkpoint -> flax; runs flow on a textured
                 pair with a known rigid shift; PASS = finite flow and
                 (real weights) median endpoint error < --raft-epe-max.
  loss_curve     tools/compare_loss_curve.py at recipe hyperparams (the
                 live torch reference vs our jitted step from identical
                 weights/batches); PASS = max |loss gap| < --curve-tol.
  linear_probe   eval.driver.linear_eval of the imported checkpoint on
                 --imagenet-root; PASS = finite accuracy in [0, 100] and
                 (if set) best_acc1 >= --linear-acc-min.
  d2_export      published .msgpack -> detectron2 pickle; PASS = the d2
                 key audit (stem/res2..res5 layout, conv/norm leaves).
  bdd_smoke      (only with --bdd-root) a short real-data pretrain at the
                 nframe recipe shape; PASS = finite logged losses.

--dry-run synthesizes every missing input as a fixture (random-weight
reference torch modules via /root/reference, tiny synthetic image trees)
and relaxes the real-weights-only thresholds, so the whole battery is
executable TODAY and cannot bit-rot (tests/test_validate_release.py runs
it). --stages runs a comma-named subset (the rest report SKIPPED).

A stage that raises (unknown released artifact, shape mismatch, OOM...)
becomes a FAIL row with the traceback tail; later independent stages still
run and the report is always written. Report: one JSON line per stage + a
summary line; exit 0 iff no stage FAILED. Written to
<out>/validate_report.json as well.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def _stub_torchvision():
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _tree_spec(tree, prefix=()):
    """Flat {path: shape} over a nested dict tree."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_spec(v, prefix + (k,)))
        else:
            import numpy as np
            out["/".join(prefix + (k,))] = tuple(np.shape(v))
    return out


def make_fixture_pixpro(path: str, arch: str):
    """Random-weight reference PixPro checkpoint in the released format
    ({'model': DDP-prefixed state dict})."""
    _stub_torchvision()
    import socket
    import torch
    if not torch.distributed.is_initialized():
        # the reference PixPro __init__ derives its EMA ramp K from
        # dist.get_world_size() (`contrast/models/PixPro.py:294-295`)
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
        torch.distributed.init_process_group(
            "gloo", init_method=f"tcp://127.0.0.1:{port}",
            rank=0, world_size=1)
    from contrast import resnet as ref_resnet
    from contrast.models.PixPro import PixPro as RefPixPro
    from tools.ref_loop import make_ref_args
    torch.manual_seed(7)
    model = RefPixPro(ref_resnet.__dict__[arch], make_ref_args())
    torch.save({"model": {"module." + k: v
                          for k, v in model.state_dict().items()}}, path)
    return path


def make_fixture_raft(path: str, small: bool):
    """Random-weight reference RAFT checkpoint (DataParallel-prefixed keys,
    like the released raft-small.pth)."""
    _stub_torchvision()
    import torch
    from contrast.flow import RAFT as RefRAFT
    targs = argparse.Namespace(small=small, dropout=0.0,
                               alternate_corr=False, mixed_precision=False)
    torch.manual_seed(9)
    torch.save(torch.nn.DataParallel(RefRAFT(targs)).state_dict(), path)
    return path


def make_fixture_imagenet(root: str, n_per_class: int = 8):
    import numpy as np
    from PIL import Image
    rng = np.random.default_rng(5)
    for split in ("train", "val"):
        for cls, base in (("cat", 40), ("dog", 200)):
            d = os.path.join(root, split, cls)
            os.makedirs(d, exist_ok=True)
            for i in range(n_per_class):
                arr = np.clip(base + rng.integers(0, 40, (64, 64, 3)),
                              0, 255).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"))
    return root


def stage_import_pixpro(a, report):
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from pixflow_tpu.models import PixPro
    from pixflow_tpu.models.convert_pixpro import load_torch_pixpro

    variables = load_torch_pixpro(a.pixpro_ckpt)
    model = PixPro(arch=a.arch, pixpro_p=2.0, pixpro_transform_layer=1)
    im = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v_on = model.init(jax.random.PRNGKey(0), im, method=model.online,
                      train=True)
    v_k = model.init(jax.random.PRNGKey(0), im,
                     method=model.momentum_branch, train=True)
    want_p = _tree_spec({**dict(v_on["params"]), **dict(v_k["params"])})
    got_p = _tree_spec(variables["params"])
    missing = sorted(set(want_p) - set(got_p))
    extra = sorted(set(got_p) - set(want_p))
    shape_bad = sorted(k for k in set(want_p) & set(got_p)
                       if want_p[k] != got_p[k])
    feats, _ = model.apply({"params": variables["params"],
                            "batch_stats": variables["batch_stats"]},
                           im, train=True, mutable=["batch_stats"],
                           method=model.online)
    finite = all(bool(jnp.all(jnp.isfinite(f)))
                 for f in jax.tree.leaves(feats))
    published = os.path.join(a.out, "pixpro_imported.msgpack")
    with open(published, "wb") as f:
        f.write(serialization.msgpack_serialize({
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "epoch": -1,
            "config": json.dumps({"imported_from": a.pixpro_ckpt}),
        }))
    ok = not missing and not extra and not shape_bad and finite
    report("import_pixpro", ok, {
        "params": len(got_p), "missing": missing[:8], "extra": extra[:8],
        "shape_mismatch": shape_bad[:8], "probe_finite": finite,
        "published": published})
    return published if ok else None


def stage_import_raft(a, report):
    import jax.numpy as jnp
    import numpy as np
    from pixflow_tpu.models.raft import load_raft

    model, variables = load_raft(a.raft_ckpt, small=a.raft_small)
    rng = np.random.default_rng(3)
    h, w, dx, dy = 64, 96, 4, 2
    # smooth textured image: random field blurred by separable box passes
    img = rng.standard_normal((h, w, 3)).astype(np.float32)
    for _ in range(6):
        img = (img + np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1)) / 5.0
    img = 127.5 + 100.0 * img / np.abs(img).max()
    img2 = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    flow_low, flow_up = model.apply(
        variables, jnp.asarray(img[None]), jnp.asarray(img2[None]), iters=12)
    flow_up = np.asarray(flow_up)[0]
    finite = bool(np.all(np.isfinite(flow_up)))
    # interior crop: rolled borders wrap, real motion is only valid inside
    inner = flow_up[16:-16, 16:-16]
    epe = float(np.median(np.hypot(inner[..., 0] - dx, inner[..., 1] - dy)))
    ok = finite and (a.dry_run or epe < a.raft_epe_max)
    report("import_raft", ok, {
        "finite": finite, "median_epe_px": round(epe, 3),
        "shift_px": [dx, dy],
        "epe_thresholded": not a.dry_run, "max_epe": a.raft_epe_max})
    return ok


def stage_loss_curve(a, report):
    env = dict(os.environ)
    env.update(CURVE_STEPS=str(a.curve_steps), CURVE_FLOW="1",
               CURVE_JAX_DTYPE="float32")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "compare_loss_curve.py")],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    summary = None
    for line in proc.stdout.splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("metric") == "loss_curve_max_abs_diff":
            summary = rec
    ok = (proc.returncode == 0 and summary is not None
          and summary["value"] < a.curve_tol)
    report("loss_curve", ok, {
        "steps": a.curve_steps, "tol": a.curve_tol,
        "summary": summary, "seconds": round(time.time() - t0, 1),
        "stderr_tail": proc.stderr[-400:] if proc.returncode else ""})
    return ok


def stage_linear_probe(a, published, report):
    import numpy as np
    from pixflow_tpu.configs import LinearConfig
    from pixflow_tpu.eval.driver import linear_eval

    cfg = LinearConfig()
    cfg.data.data_dir = a.imagenet_root
    cfg.data.dataset = "ImageNet"
    cfg.data.aug = "NULL"
    cfg.data.crop = 0.5
    cfg.data.image_size = a.linear_image_size
    cfg.data.num_workers = 1
    cfg.total_batch_size = a.linear_batch
    cfg.num_classes = a.num_classes
    cfg.model.arch = a.arch
    cfg.optim.base_lr = 1.0
    cfg.optim.epochs = a.linear_epochs
    cfg.optim.warmup_epoch = 0
    cfg.runtime.output_dir = os.path.join(a.out, "linear")
    cfg.runtime.print_freq = 50
    cfg.runtime.save_freq = max(a.linear_epochs, 1)
    cfg.runtime.compute_dtype = "float32"
    res = linear_eval(cfg, published)
    acc = float(res["best_acc1"])
    ok = np.isfinite(acc) and 0.0 <= acc <= 100.0 and (
        a.linear_acc_min is None or acc >= a.linear_acc_min)
    report("linear_probe", ok, {
        "best_acc1": acc, "epochs": a.linear_epochs,
        "acc_thresholded": a.linear_acc_min is not None,
        "acc_min": a.linear_acc_min})
    return ok


def stage_d2_export(a, published, report):
    from pixflow_tpu.eval import flax_resnet_to_d2
    from pixflow_tpu.utils.checkpoint import load_published, select_branch

    pub = load_published(published)
    params, stats = select_branch(pub["params"], pub.get("batch_stats", {}),
                                  "online")
    out_pkl = os.path.join(a.out, "pixpro_d2.pkl")
    weights = flax_resnet_to_d2(params.get("encoder", params),
                                stats.get("encoder", stats), out_pkl)
    keys = set(weights)
    need = {"stem.conv1.weight", "stem.conv1.norm.weight",
            "stem.conv1.norm.running_mean"}
    stages = {k.split(".")[0] for k in keys if k.startswith("res")}
    audit_ok = (need <= keys and stages == {"res2", "res3", "res4", "res5"}
                and not any("module." in k for k in keys)
                and os.path.exists(out_pkl))
    report("d2_export", audit_ok, {
        "n_keys": len(keys), "stages": sorted(stages), "pkl": out_pkl})
    return audit_ok


def stage_bdd_smoke(a, report):
    import numpy as np
    from pixflow_tpu.configs import PretrainConfig
    from pixflow_tpu.train.driver import train

    cfg = PretrainConfig()
    cfg.data.data_dir = a.bdd_root
    cfg.data.dataset = "bdd100k"
    cfg.data.aug = "BYOL"
    cfg.data.crop = 0.5
    cfg.data.image_size = a.linear_image_size
    cfg.data.n_frames = 1
    cfg.data.batch_size = a.linear_batch
    cfg.data.num_workers = 1
    cfg.model.arch = a.arch
    cfg.model.pixpro_transform_layer = 1
    cfg.optim.epochs = 1
    cfg.optim.warmup_epoch = 1
    cfg.runtime.output_dir = os.path.join(a.out, "bdd_smoke")
    cfg.runtime.compute_dtype = "float32"
    cfg.runtime.print_freq = 1
    cfg.runtime.debug_epochs = 1
    train(cfg)
    losses = []
    with open(os.path.join(cfg.runtime.output_dir, "metrics.jsonl")) as f:
        for line in f:
            losses.append(json.loads(line)["loss"])
    ok = len(losses) > 0 and all(np.isfinite(l) for l in losses)
    report("bdd_smoke", ok, {"steps_logged": len(losses),
                             "last_loss": losses[-1] if losses else None})
    return ok


def main():
    p = argparse.ArgumentParser("release validation runbook")
    p.add_argument("--pixpro-ckpt", help="released torch PixPro .pth")
    p.add_argument("--raft-ckpt", help="released raft .pth (e.g. raft-small)")
    p.add_argument("--raft-basic", dest="raft_small", action="store_false",
                   default=True, help="checkpoint is the basic variant")
    p.add_argument("--arch", default="resnet50",
                   help="backbone arch of the PixPro checkpoint")
    p.add_argument("--bdd-root", help="BDD100k frames root (train/<video>/)")
    p.add_argument("--imagenet-root", help="labeled train/val class tree")
    p.add_argument("--out", default="output/validate_release")
    p.add_argument("--dry-run", action="store_true",
                   help="synthesize missing inputs as random fixtures and "
                        "relax real-weights-only thresholds")
    p.add_argument("--stages", default=None,
                   help="comma list to run a subset (import_pixpro,"
                        "import_raft,loss_curve,linear_probe,d2_export,"
                        "bdd_smoke); others are SKIPPED. Default: all")
    p.add_argument("--curve-steps", type=int, default=None,
                   help="loss-curve steps (default 200; dry-run 3)")
    p.add_argument("--curve-tol", type=float, default=0.05)
    p.add_argument("--raft-epe-max", type=float, default=1.5)
    p.add_argument("--linear-epochs", type=int, default=None,
                   help="default 20; dry-run 1")
    p.add_argument("--linear-acc-min", type=float, default=None,
                   help="fail linear probe below this top-1 (default: "
                        "report-only)")
    p.add_argument("--linear-image-size", type=int, default=None,
                   help="default 224; dry-run 64")
    p.add_argument("--linear-batch", type=int, default=None,
                   help="default 256; dry-run 4")
    p.add_argument("--num-classes", type=int, default=None,
                   help="default 1000; dry-run fixture 2")
    a = p.parse_args()

    if os.environ.get("VREL_PLATFORM"):
        # the axon TPU plugin ignores JAX_PLATFORMS (CLAUDE.md); tests run
        # this tool in a subprocess and need the config-level override
        import jax
        jax.config.update("jax_platforms", os.environ["VREL_PLATFORM"])

    os.makedirs(a.out, exist_ok=True)
    a.curve_steps = a.curve_steps or (3 if a.dry_run else 200)
    a.linear_epochs = a.linear_epochs or (1 if a.dry_run else 20)
    a.linear_image_size = a.linear_image_size or (64 if a.dry_run else 224)
    if a.linear_batch is None:
        if a.dry_run:
            # the eval driver shards batches over ALL devices; under the
            # tests' 8-virtual-CPU-device env a batch of 4 is unshardable
            import jax
            a.linear_batch = max(4, jax.device_count())
        else:
            a.linear_batch = 256

    if a.dry_run:
        fix = os.path.join(a.out, "fixtures")
        os.makedirs(fix, exist_ok=True)
        if not a.pixpro_ckpt:
            # the fixture stays resnet50: the reference's Proj_Head
            # hardcodes the 2048-dim c5 input, so no smaller arch can
            # round-trip through the real checkpoint format
            a.pixpro_ckpt = make_fixture_pixpro(
                os.path.join(fix, "pixpro.pth"), a.arch)
        if not a.raft_ckpt:
            # honor --raft-basic in dry-run too: the fixture must be the
            # same variant stage_import_raft will load (small=a.raft_small)
            name = "raft-small.pth" if a.raft_small else "raft-basic.pth"
            a.raft_ckpt = make_fixture_raft(
                os.path.join(fix, name), small=a.raft_small)
        if not a.imagenet_root:
            a.imagenet_root = make_fixture_imagenet(
                os.path.join(fix, "imagenet"))
            a.num_classes = 2
    a.num_classes = a.num_classes or 1000

    rows = []

    def report(stage, ok, detail):
        row = {"stage": stage, "status": "PASS" if ok else "FAIL",
               "detail": detail}
        rows.append(row)
        print(json.dumps(row), flush=True)

    def skip(stage, why):
        rows.append({"stage": stage, "status": "SKIPPED", "detail": why})
        print(json.dumps(rows[-1]), flush=True)

    def guarded(stage, fn, *args):
        # one crashing stage (unknown released artifact, shape mismatch,
        # OOM...) must become a FAIL row, not kill the battery: the whole
        # point of the runbook is that later independent stages still run
        # and validate_report.json is always written
        try:
            return fn(*args)
        except Exception:
            import traceback
            report(stage, False, {"exception": traceback.format_exc()[-2000:]})
            return None

    wanted = (set(s.strip() for s in a.stages.split(",") if s.strip())
              if a.stages else None)
    known = {"import_pixpro", "import_raft", "loss_curve", "linear_probe",
             "d2_export", "bdd_smoke"}
    if wanted is not None and not wanted <= known:
        p.error(f"unknown --stages: {sorted(wanted - known)}")

    def want(stage):
        if wanted is not None and stage not in wanted:
            skip(stage, "not in --stages")
            return False
        return True

    published = None
    if want("import_pixpro"):
        if a.pixpro_ckpt:
            published = guarded("import_pixpro", stage_import_pixpro,
                                a, report)
        else:
            skip("import_pixpro", "no --pixpro-ckpt")
    if want("import_raft"):
        if a.raft_ckpt:
            guarded("import_raft", stage_import_raft, a, report)
        else:
            skip("import_raft", "no --raft-ckpt")
    if want("loss_curve"):
        if os.path.isdir(REF):
            guarded("loss_curve", stage_loss_curve, a, report)
        else:
            skip("loss_curve", f"reference not present at {REF}")
    if want("linear_probe"):
        if published and a.imagenet_root:
            guarded("linear_probe", stage_linear_probe, a, published, report)
        else:
            skip("linear_probe",
                 "needs import_pixpro PASS + --imagenet-root")
    if want("d2_export"):
        if published:
            guarded("d2_export", stage_d2_export, a, published, report)
        else:
            skip("d2_export", "needs import_pixpro PASS")
    if want("bdd_smoke"):
        if a.bdd_root:
            guarded("bdd_smoke", stage_bdd_smoke, a, report)
        else:
            skip("bdd_smoke", "no --bdd-root")

    statuses = [r["status"] for r in rows]
    summary = {"metric": "validate_release",
               "pass": statuses.count("PASS"),
               "fail": statuses.count("FAIL"),
               "skipped": statuses.count("SKIPPED"),
               "dry_run": a.dry_run,
               "ok": "FAIL" not in statuses}
    print(json.dumps(summary))
    with open(os.path.join(a.out, "validate_report.json"), "w") as f:
        json.dump({"summary": summary, "stages": rows}, f, indent=1)
    sys.exit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
