"""Shared scaffolding for running the REFERENCE torch training composition.

Used by both the trajectory oracles (`tests/test_reference_parity.py`,
`tests/test_full_model_parity.py`) and the runnable loss-curve tool
(`tools/compare_loss_curve.py`) so a fix to the reference wiring lands in
exactly one place and the tool keeps asserting the same reference
semantics as the tests.

Nothing here imports torch or the reference at module scope — callers pass
the already-imported modules in, keeping this importable in torch-less
environments.
"""

from __future__ import annotations

import types


def desync_batchnorm(module, torch):
    """SyncBatchNorm -> BatchNorm2d (identical params/stats) so the
    reference model runs on CPU; with world size 1 the statistics are
    identical (`contrast/models/PixPro.py:289-292` wraps in SyncBN)."""
    for name, child in module.named_children():
        if isinstance(child, torch.nn.SyncBatchNorm):
            bn = torch.nn.BatchNorm2d(child.num_features, child.eps,
                                      child.momentum, child.affine,
                                      child.track_running_stats)
            bn.load_state_dict(child.state_dict())
            setattr(module, name, bn)
        else:
            desync_batchnorm(child, torch)


def make_ref_args(**overrides):
    """The reference driver's argparse namespace, defaults matching the
    oracle recipes (`/root/reference/main_pretrain.py:34-127`). Override
    per-test knobs by keyword."""
    args = types.SimpleNamespace(
        pixpro_p=2.0, pixpro_momentum=0.99, pixpro_pos_ratio=0.7,
        pixpro_clamp_value=0.0, pixpro_transform_layer=1,
        pixpro_ins_loss_weight=0.0, num_instances=1024, batch_size=8,
        epochs=10, start_epoch=1, output_dir="/tmp/refout",
        lr_scheduler="cosine", warmup_epoch=1, warmup_multiplier=100,
        feature_dim=256, head_type="early_return")
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def make_ref_flow_args_fn(torch, ref_util, upflow8, alpha1, alpha2,
                          size=(720, 1280)):
    """Build `ref_flow_args(batch) -> (coord1_args, coord2_args)` running
    apply_optical_flow's use_flow_file+flow_up branch on CPU
    (`/root/reference/contrast/util.py:181-248`): permute to
    [num, B, 2, h, w], upflow8, compose windows, cycle-consistency masks.

    `batch` carries numpy `coord1/coord2` [B, 10] and `flows_fwd/flows_bwd`
    [B, num, 2, h, w].
    """
    size_t = torch.tensor(list(size))

    def ref_flow_args(batch):
        ff = torch.from_numpy(batch["flows_fwd"]).permute(1, 0, 2, 3, 4)
        fb = torch.from_numpy(batch["flows_bwd"]).permute(1, 0, 2, 3, 4)
        num, nb, c, h, w = ff.shape
        ff = upflow8(ff.reshape(-1, c, h, w)).reshape(
            num, nb, c, 8 * h, 8 * w)
        fb = upflow8(fb.reshape(-1, c, h, w)).reshape(
            num, nb, c, 8 * h, 8 * w)
        flow_f, flow_b = ref_util.all_concat_flow(ff, fb,
                                                  use_flow_frames=False)
        _, _, (mask_f, _) = ref_util.forward_backward_consistency(
            flow_f, flow_b, alpha_1=alpha1, alpha_2=alpha2)
        _, _, (mask_b, _) = ref_util.forward_backward_consistency(
            flow_b, flow_f, alpha_1=alpha1, alpha_2=alpha2)
        return ([torch.from_numpy(batch["coord1"]),
                 [flow_f, size_t, mask_f]],
                [torch.from_numpy(batch["coord2"]),
                 [flow_b, size_t, mask_b]])

    return ref_flow_args
