#!/usr/bin/env python
"""Multi-span ablation: does the defined multi-span semantics help?

The reference ships `use_flow_frames` broken (SURVEY §4.6), so this
framework defines its own multi-span semantics (models/pixpro.py:
multi_span_loss): every (span, start) window of the K consecutive flows
pairs a view-1 crop of frame `start` with a view-2 crop of frame
`start+span`. This script quantifies the value of those extra windows with
synthetic ground truth:

  * scene: a rigid scene translating by a known per-frame shift — the true
    correspondence between any two frames is exact;
  * flows: the true per-pair shifts on the 1/8 grid, corrupted by per-pair
    Gaussian noise of RAFT-error magnitude (sigma, full-res px). Composition
    accumulates the noise, like composed RAFT flows accumulate error;
  * metric: precision/recall of each window's positive-pair mask (the loss
    geometry, `ops/loss.pair_loss_geometry` + cycle mask) against the mask
    computed from the exact flow.

Expected (and measured — docs/DESIGN.md): long-span windows lose positive-
pair precision as noise accumulates; the short-span windows that ONLY
multi-span mode trains on keep near-perfect masks, so multi-span supplies
strictly higher-precision supervision than the single full-span pair at
equal flow error.

Env: ABL_SIGMAS (default "0,1,2,4"), ABL_K (5), ABL_SEED. Prints one JSON
line per (sigma, span).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(k=5, sigmas=(0.0, 1.0, 2.0, 4.0), seed=0, pos_ratio=0.7,
        alpha1=0.01, alpha2=0.5, n_scenes=8):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pixflow_tpu.ops.flow import compose_and_mask, span_windows
    from pixflow_tpu.ops.loss import pair_loss_geometry

    fh, fw = 90, 160
    H, W = 720, 1280
    rng = np.random.default_rng(seed)
    windows = span_windows(k)
    out = []

    import functools
    compose_masked = jax.jit(functools.partial(
        compose_and_mask, flow_up=False, use_flow_frames=True,
        alpha_1=alpha1, alpha_2=alpha2))
    compose_plain = jax.jit(functools.partial(
        compose_and_mask, flow_up=False, use_flow_frames=True))
    geom_masked = jax.jit(lambda cq, ck, fl, ms: pair_loss_geometry(
        cq, ck, (7, 7), pos_ratio, flow=fl, flow_mask=ms)["pos"])
    geom_plain = jax.jit(lambda cq, ck, fl: pair_loss_geometry(
        cq, ck, (7, 7), pos_ratio, flow=fl)["pos"])

    for sigma in sigmas:
        stats = {}  # span -> [tp, pred, gt]
        for _ in range(n_scenes):
            # per-pair true shifts (full-res px, moderate driving-scale motion)
            shifts = rng.uniform(-18, 18, (k, 2)).astype(np.float32)

            # per-frame crops (view1 of frame f, view2 of frame f+1)
            def crop_coords():
                j = int(rng.integers(0, 500))
                i = int(rng.integers(0, 250))
                w_ = int(rng.integers(300, 640))
                h_ = int(rng.integers(250, 420))
                return np.array([j / (W - 1), i / (H - 1),
                                 (j + w_ - 1) / (W - 1), (i + h_ - 1) / (H - 1),
                                 j, i, w_, h_, W, H], np.float32)

            c1 = np.stack([crop_coords() for _ in range(k)])
            c2 = np.stack([crop_coords() for _ in range(k)])

            # stored flows: 1/8-res grid, 1/8-px units (+ sigma noise);
            # backward stack in the reference's mirrored-pair order
            # (`util.py:88-91`): bwd[i] = reverse flow of pair k-1-i
            base = np.broadcast_to(shifts[:, None, None, :] / 8.0,
                                   (k, fh, fw, 2)).astype(np.float32)
            noisy = base + (sigma / 8.0) * rng.standard_normal(
                (k, fh, fw, 2)).astype(np.float32)
            noisy_b = -base[::-1] + (sigma / 8.0) * rng.standard_normal(
                (k, fh, fw, 2)).astype(np.float32)

            f_noisy, _, m_noisy_f, _ = compose_masked(
                jnp.asarray(noisy[None]), jnp.asarray(noisy_b[None]))
            if sigma == 0:
                f_noisy, _, _, _ = compose_plain(
                    jnp.asarray(noisy[None]), jnp.asarray(noisy_b[None]))

            for widx, (span, s) in enumerate(windows):
                cq = jnp.asarray(c1[s][None])
                ck = jnp.asarray(c2[s + span - 1][None])
                total = shifts[s:s + span].sum(0) / 8.0
                gt_flow = jnp.broadcast_to(
                    jnp.asarray(total, jnp.float32), (1, fh, fw, 2))

                if sigma > 0:
                    pos_pred = geom_masked(cq, ck, f_noisy[widx],
                                           m_noisy_f[widx])
                else:
                    pos_pred = geom_plain(cq, ck, f_noisy[widx])
                pos_gt = geom_plain(cq, ck, gt_flow)
                pred = np.asarray(pos_pred)[0] > 0
                gt = np.asarray(pos_gt)[0] > 0
                t = stats.setdefault(span, [0, 0, 0])
                t[0] += int((pred & gt).sum())
                t[1] += int(pred.sum())
                t[2] += int(gt.sum())

        for span in sorted(stats):
            tp, p, g = stats[span]
            rec = {
                "metric": "multispan_posmask_quality",
                "sigma_px": sigma, "span": span,
                "precision": round(tp / p, 4) if p else None,
                "recall": round(tp / g, 4) if g else None,
                "pred_pos": p, "gt_pos": g,
            }
            out.append(rec)
            print(json.dumps(rec))
    return out


if __name__ == "__main__":
    sig = tuple(float(x) for x in
                os.environ.get("ABL_SIGMAS", "0,1,2,4").split(","))
    run(k=int(os.environ.get("ABL_K", "5")), sigmas=sig,
        seed=int(os.environ.get("ABL_SEED", "0")))
