#!/usr/bin/env python
"""Loss-curve comparison vs the reference implementation.

Runs the reference's ACTUAL torch training composition (PixPro with
in-forward cosine-ramped EMA + add_weight_decay + SGD+LARS +
per-iteration GradualWarmupScheduler — `main_pretrain.py:259-269`) and our
jitted train step from IDENTICAL initial weights on IDENTICAL synthetic
batches for N steps, and reports the per-step loss curves side by side.

This is the runnable, longer-horizon extension of the 5-step trajectory
oracle (`tests/test_reference_parity.py::
test_composed_train_step_trajectory_parity`); with no BDD100k on this
machine it is the strongest executable form of the BASELINE.json
"loss curves matching the reference" target. Writes one JSONL row per step
and a final summary line to stdout.

Env: CURVE_STEPS (default 30), CURVE_BATCH (2), CURVE_HW (64),
CURVE_FLOW=1 (precomputed-flow path), CURVE_SEED,
CURVE_JAX_DTYPE=bfloat16 to run OUR side at bf16 compute (f32 params/EMA;
the torch reference stays f32) — the dtype-adjudication study: how far a
bf16-compute trajectory drifts from the reference's O0 recipe.
"""

import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main():
    steps = int(os.environ.get("CURVE_STEPS", "30"))
    b = int(os.environ.get("CURVE_BATCH", "2"))
    hw = int(os.environ.get("CURVE_HW", "64"))
    with_flow = os.environ.get("CURVE_FLOW", "0") == "1"
    seed = int(os.environ.get("CURVE_SEED", "0"))

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29573", rank=0, world_size=1)

    import importlib
    ref_pixpro_mod = importlib.import_module("contrast.models.PixPro")
    ref_util = importlib.import_module("contrast.util")
    import contrast.resnet as ref_resnet
    from contrast.flow import upflow8
    from contrast.lars import LARS as RefLARS, add_weight_decay
    from contrast.lr_scheduler import get_scheduler

    from pixflow_tpu.models import PixPro
    from pixflow_tpu.models.convert_pixpro import torch_pixpro_to_flax
    from pixflow_tpu.train import (TrainState, frozen_momentum_branch_mask,
                                   lars_sgd, make_lr_schedule,
                                   make_train_step)

    LR, WD, MOM = 0.4, 1e-5, 0.9
    EPOCHS, WARMUP, SPE = 10, 1, max(steps, 10)
    alpha1, alpha2 = 0.01, 0.5

    from tools.ref_loop import (desync_batchnorm, make_ref_args,
                                make_ref_flow_args_fn)

    args = make_ref_args(epochs=EPOCHS, warmup_epoch=WARMUP)
    torch.manual_seed(seed + 100)
    ref_model = ref_pixpro_mod.PixPro(ref_resnet.resnet50, args)
    desync_batchnorm(ref_model, torch)
    ref_model.train()
    init_sd = {"module." + k: v.detach().clone()
               for k, v in ref_model.state_dict().items()}

    rng = np.random.default_rng(seed)

    def coords(bn):
        out = np.zeros((bn, 10), np.float32)
        for i in range(bn):
            j, ii = int(rng.integers(0, 600)), int(rng.integers(0, 300))
            w_, h_ = int(rng.integers(150, 600)), int(rng.integers(150, 400))
            out[i] = [j / 1279, ii / 719, (j + w_ - 1) / 1279,
                      (ii + h_ - 1) / 719, j, ii, w_, h_, 1280, 720]
        return out

    def smooth_flows(bn):
        """Per-sample smooth affine motion + noise with a consistent
        backward field, so the cycle mask keeps a plausible trusted
        fraction (random flows would zero out every positive pair)."""
        fh, fw = 90, 160
        ys = np.linspace(-1, 1, fh, dtype=np.float32)[None, :, None]
        xs = np.linspace(-1, 1, fw, dtype=np.float32)[None, None, :]
        t = rng.uniform(-3, 3, (bn, 2, 1, 1)).astype(np.float32)
        gx = rng.uniform(-1.5, 1.5, (bn, 2, 1, 1)).astype(np.float32)
        gy = rng.uniform(-1.5, 1.5, (bn, 2, 1, 1)).astype(np.float32)
        base = (t + gx * xs + gy * ys)[:, None]          # [b, 1, 2, fh, fw]
        fwd = base + 0.2 * rng.standard_normal(
            (bn, 1, 2, fh, fw)).astype(np.float32)
        bwd = -base + 0.2 * rng.standard_normal(
            (bn, 1, 2, fh, fw)).astype(np.float32)
        return fwd, bwd

    batches = []
    for _ in range(steps):
        ff, fb = smooth_flows(b)
        batches.append(dict(
            im1=rng.standard_normal((b, 3, hw, hw)).astype(np.float32),
            im2=rng.standard_normal((b, 3, hw, hw)).astype(np.float32),
            coord1=coords(b), coord2=coords(b),
            flows_fwd=ff, flows_bwd=fb))

    ref_flow_args = make_ref_flow_args_fn(torch, ref_util, upflow8,
                                          alpha1, alpha2)

    opt = torch.optim.SGD(add_weight_decay(ref_model, WD), lr=LR,
                          momentum=MOM)
    opt = RefLARS(opt)
    scheduler = get_scheduler(opt, SPE, args)

    ref_losses = []
    for bt in batches:
        if with_flow:
            c1, c2 = ref_flow_args(bt)
        else:
            c1 = torch.from_numpy(bt["coord1"])
            c2 = torch.from_numpy(bt["coord2"])
        loss, _ = ref_model(torch.from_numpy(bt["im1"]),
                            torch.from_numpy(bt["im2"]), c1, c2)
        opt.zero_grad()
        loss.backward()
        opt.step()
        scheduler.step()
        ref_losses.append(float(loss.detach()))

    variables = torch_pixpro_to_flax(init_sd)
    jax_dtype = getattr(jnp, os.environ.get("CURVE_JAX_DTYPE", "float32"))
    model = PixPro(arch="resnet50", pixpro_p=2.0, pixpro_transform_layer=1,
                   pixpro_pos_ratio=0.7, dtype=jax_dtype)
    lr_sched = make_lr_schedule("cosine", LR, EPOCHS, WARMUP, SPE)
    tx = lars_sgd(lr_sched, momentum=MOM, weight_decay=WD,
                  frozen_mask=frozen_momentum_branch_mask(variables["params"]))
    state = TrainState(
        step=jnp.zeros([], jnp.int32), ema_k=jnp.zeros([], jnp.int32),
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]))
    step = make_train_step(
        model, tx, lr_schedule=lr_sched, ema_total_steps=1280,
        ema_base_momentum=0.99, use_flow=with_flow, flow_up=with_flow,
        alpha1=alpha1 if with_flow else None,
        alpha2=alpha2 if with_flow else None, donate=False)

    ours = []
    for bt in batches:
        jb = {"im1": jnp.asarray(bt["im1"].transpose(0, 2, 3, 1)),
              "im2": jnp.asarray(bt["im2"].transpose(0, 2, 3, 1)),
              "coord1": jnp.asarray(bt["coord1"]),
              "coord2": jnp.asarray(bt["coord2"])}
        if with_flow:
            jb["flows_fwd"] = jnp.asarray(
                bt["flows_fwd"].transpose(0, 1, 3, 4, 2))
            jb["flows_bwd"] = jnp.asarray(
                bt["flows_bwd"].transpose(0, 1, 3, 4, 2))
        state, metrics = step(state, jb)
        ours.append(float(metrics["loss"]))

    diffs = [abs(a - r) for a, r in zip(ours, ref_losses)]
    for i, (r, o, d) in enumerate(zip(ref_losses, ours, diffs)):
        print(json.dumps({"step": i, "ref_loss": round(r, 6),
                          "ours_loss": round(o, 6),
                          "abs_diff": round(d, 6)}))
    print(json.dumps({
        "metric": "loss_curve_max_abs_diff",
        "steps": steps, "with_flow": with_flow,
        "jax_dtype": jax_dtype.__name__,
        "value": round(max(diffs), 6),
        "mean_abs_diff": round(sum(diffs) / len(diffs), 6),
        "final_ref": round(ref_losses[-1], 6),
        "final_ours": round(ours[-1], 6),
    }))


if __name__ == "__main__":
    main()
