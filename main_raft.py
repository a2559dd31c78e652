#!/usr/bin/env python
"""RAFT fine-tuning CLI (TPU counterpart of the original RAFT train.py,
which the reference relied on out-of-tree — see `dataset_prepare/raft_bdd100k`
and `contrast/flow/datasets.py:212-281`).

Stages follow the standard curriculum (chairs -> things -> sintel/kitti).
Example:
    python main_raft.py --stage chairs --chairs-root data/FlyingChairs_release \\
        --num-steps 120000 --batch-size 8 --lr 4e-4 --output-dir out/raft
"""

from __future__ import annotations

import argparse
import json
import os
import random
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser("pixflow-tpu RAFT fine-tuning")
    p.add_argument("--stage", default="chairs",
                   choices=["chairs", "things", "sintel", "kitti"])
    p.add_argument("--chairs-root", default="")
    p.add_argument("--things-root", default="")
    p.add_argument("--sintel-root", default="")
    p.add_argument("--kitti-root", default="")
    p.add_argument("--hd1k-root", default="")
    p.add_argument("--small", action="store_true")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--crop-size", nargs=2, type=int, default=None,
                   help="default: stage-standard crop")
    p.add_argument("--batch-size", type=int, default=8,
                   help="global batch (sharded over the data mesh)")
    p.add_argument("--num-steps", type=int, default=120000)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--clip-norm", type=float, default=1.0)
    p.add_argument("--restore", default="", help="warm-start PARAMS "
                   "(.msgpack from this trainer or a torch .pth via the "
                   "importer); optimizer/schedule start fresh")
    p.add_argument("--resume", default="", help="resume a fine-tune from a "
                   "full train-state checkpoint (raft_state.msgpack: params "
                   "+ optimizer moments + step); 'auto' picks it up from "
                   "--output-dir")
    p.add_argument("--output-dir", default="./output/raft")
    p.add_argument("--print-freq", type=int, default=100)
    p.add_argument("--save-freq", type=int, default=5000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--validate", default="",
                   choices=["", "chairs", "sintel", "kitti"],
                   help="run benchmark validation after every save and at "
                        "the end (original evaluate.py counterpart)")
    p.add_argument("--val-max-samples", type=int, default=None)
    p.add_argument("--submit", default="", choices=["", "sintel", "kitti"],
                   help="write benchmark test-set submission files "
                        "(original evaluate.py create_*_submission) and exit")
    p.add_argument("--submit-out", default="", help="submission output dir")
    return p.parse_args()


STAGE_CROPS = {"chairs": (368, 496), "things": (400, 720),
               "sintel": (368, 768), "kitti": (288, 960)}


def main():
    a = parse_args()
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from pixflow_tpu.data.raft_datasets import fetch_stage_dataset
    from pixflow_tpu.models.raft import RAFT
    from pixflow_tpu.parallel import make_data_mesh
    from pixflow_tpu.parallel.mesh import enable_compilation_cache
    from pixflow_tpu.train.raft_trainer import (make_raft_train_step,
                                                raft_optimizer)

    enable_compilation_cache()
    os.makedirs(a.output_dir, exist_ok=True)

    crop = tuple(a.crop_size) if a.crop_size else STAGE_CROPS[a.stage]
    roots = {"chairs": a.chairs_root, "things": a.things_root,
             "sintel": a.sintel_root, "kitti": a.kitti_root,
             "hd1k": a.hd1k_root}
    dataset = None
    if a.num_steps > 0 and not a.submit:
        dataset = fetch_stage_dataset(a.stage, roots, crop)
        assert len(dataset) > 0, \
            f"no samples for stage {a.stage} under {roots}"
        print(f"training with {len(dataset)} image pairs, crop {crop}")

    n_dev = len(jax.devices())
    mesh = make_data_mesh(n_dev) if n_dev > 1 else None
    assert a.batch_size % max(n_dev, 1) == 0

    model = RAFT(small=a.small)
    rng = np.random.default_rng(a.seed)
    h, w = crop
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(a.seed), dummy, dummy, iters=1)
    params = variables["params"]

    if a.restore:
        if a.restore.endswith(".pth"):
            from pixflow_tpu.models.raft.convert import load_raft
            _, variables = load_raft(a.restore, small=a.small)
            params = variables["params"]
        else:
            with open(a.restore, "rb") as f:
                params = serialization.from_bytes(params, f.read())

    schedule, tx = raft_optimizer(a.lr, a.num_steps, a.weight_decay,
                                  a.clip_norm)
    state = (params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = make_raft_train_step(model, tx, iters=a.iters, gamma=a.gamma,
                                   mesh=mesh)

    # full-state resume (params + optimizer moments + step): a warm restart
    # of a long fine-tune must NOT re-warm-up from lr/25 with fresh Adam
    # moments — that is a materially different trajectory
    state_path = os.path.join(a.output_dir, "raft_state.msgpack")
    start_step = 0
    resume = state_path if a.resume == "auto" else a.resume
    if resume and os.path.exists(resume):
        with open(resume, "rb") as f:
            payload = serialization.from_bytes(
                {"params": state[0], "opt_state": state[1],
                 "step": state[2]}, f.read())
        state = (payload["params"], payload["opt_state"], payload["step"])
        start_step = int(payload["step"])
        print(f"resumed full train state from {resume} at step {start_step}")
    elif a.resume and a.resume != "auto":
        raise FileNotFoundError(a.resume)

    def save_state(state_now):
        tmp = state_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(
                {"params": state_now[0], "opt_state": state_now[1],
                 "step": state_now[2]}))
        os.replace(tmp, state_path)

    def sample_batch(step):
        idx = rng.integers(0, len(dataset), a.batch_size)

        def build(ji):
            j, i = ji
            # collision-free per-(step, sample) seed: (step-1)*batch + j is
            # unique, unlike the old step*131 + j mix which repeated draws
            # whenever batch_size > 131
            r = random.Random(a.seed * 1_000_003
                              + (step - 1) * a.batch_size + j)
            return dataset.__getitem__(int(i), r)

        items = (list(sample_pool.map(build, enumerate(idx)))
                 if sample_pool is not None
                 else [build(ji) for ji in enumerate(idx)])
        return {k: np.stack([s[n] for s in items]).astype(np.float32)
                for n, k in enumerate(("img1", "img2", "flow", "valid"))}

    def run_validation(params_now, step):
        if not a.validate:
            return
        from pixflow_tpu.eval.flow_eval import validate_stage
        m = validate_stage(model, {"params": params_now}, a.validate, roots,
                           max_samples=a.val_max_samples)
        m = {k: float(v) for k, v in m.items()}
        m.update(step=step, split=a.validate)
        print("validation", json.dumps(m))
        with open(os.path.join(a.output_dir, "raft_val.jsonl"), "a") as f:
            f.write(json.dumps(m) + "\n")

    if a.submit:
        from pixflow_tpu.eval.flow_eval import (create_kitti_submission,
                                                create_sintel_submission)
        out = a.submit_out or os.path.join(a.output_dir,
                                           f"{a.submit}_submission")
        if a.submit == "sintel":
            create_sintel_submission(model, {"params": state[0]},
                                     roots["sintel"], out)
        else:
            create_kitti_submission(model, {"params": state[0]},
                                    roots["kitti"], out)
        print(f"wrote {a.submit} submission to {out}")
        return

    if a.num_steps <= 0:  # validation-only mode
        run_validation(state[0], 0)
        return

    from concurrent.futures import ThreadPoolExecutor
    from pixflow_tpu.utils.metrics_writer import MetricsWriter
    writer = MetricsWriter(a.output_dir, filename="raft_metrics.jsonl")
    sample_pool = (ThreadPoolExecutor(a.num_workers)
                   if a.num_workers > 1 else None)
    # one-batch lookahead on a single thread: host assembly overlaps the
    # device step, and the rng index stream stays sequential (submission
    # order) — on resume, fast-forward the stream past the consumed draws
    for _ in range(start_step):
        rng.integers(0, len(dataset), a.batch_size)
    prefetch = ThreadPoolExecutor(1)
    # a resumed run already at num_steps has nothing to assemble: an
    # unconditional submit would build one never-awaited batch past the end
    # (and silently swallow any exception it raised)
    fut = (prefetch.submit(sample_batch, start_step + 1)
           if start_step < a.num_steps else None)
    t0 = time.time()
    try:
        for step in range(start_step + 1, a.num_steps + 1):
            batch = fut.result()
            if step < a.num_steps:
                fut = prefetch.submit(sample_batch, step + 1)
            state, metrics = step_fn(state, batch)
            if step % a.print_freq == 0 or step == start_step + 1:
                m = {k: float(v) for k, v in metrics.items()}
                # the update just taken consumed schedule(step-1): optax's
                # scale_by_schedule evaluates at the pre-increment count
                m.update(lr=float(schedule(step - 1)),
                         sec_per_step=(time.time() - t0)
                         / (step - start_step))
                print(("step {step}: loss {loss:.4f} epe {epe:.3f} "
                       "1px {1px:.3f} 3px {3px:.3f} 5px {5px:.3f}")
                      .format(step=step, **m))
                writer.write(step, m)
            if step % a.save_freq == 0 or step == a.num_steps:
                path = os.path.join(a.output_dir,
                                    f"raft_{a.stage}_{step}.msgpack")
                with open(path, "wb") as f:
                    f.write(serialization.to_bytes(
                        jax.device_get(state[0])))
                save_state(jax.device_get(state))
                print(f"saved {path} (+ resumable {state_path})")
                run_validation(state[0], step)
    finally:
        prefetch.shutdown(wait=False)
        if sample_pool is not None:
            sample_pool.shutdown(wait=False)
        writer.close()


if __name__ == "__main__":
    main()
