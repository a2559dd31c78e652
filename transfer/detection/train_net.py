#!/usr/bin/env python
"""Detectron2 transfer trainer (capability of reference
`transfer/detection/train_net.py`): plain DefaultTrainer with the MoCo-style
extra-BN C4 ROI head, COCO/VOC evaluator selection. Consumes backbones
exported by `convert_pretrain_to_d2.py`.

Requires detectron2 (not bundled); the CityScapes semantic-segmentation
evaluation additionally uses detectron2's DeepLab project — see README.md."""

from __future__ import annotations

import os

try:
    from detectron2 import model_zoo  # noqa: F401
    from detectron2.checkpoint import DetectionCheckpointer
    from detectron2.config import get_cfg
    from detectron2.engine import (DefaultTrainer, default_argument_parser,
                                   default_setup, launch)
    from detectron2.evaluation import (COCOEvaluator, PascalVOCDetectionEvaluator)
    from detectron2.layers import get_norm
    from detectron2.modeling.roi_heads import ROI_HEADS_REGISTRY, Res5ROIHeads
    import torch
    HAVE_D2 = True
except ImportError:  # pragma: no cover
    HAVE_D2 = False


if HAVE_D2:

    @ROI_HEADS_REGISTRY.register()
    class Res5ROIHeadsExtraNorm(Res5ROIHeads):
        """C4 ROI head with one extra normalization layer after res5
        (the MoCo-style detection head the reference uses)."""

        def _build_res5_block(self, cfg):
            seq, out_channels = super()._build_res5_block(cfg)
            norm = cfg.MODEL.RESNETS.NORM
            seq.add_module("norm", get_norm(norm, out_channels))
            return seq, out_channels

    class Trainer(DefaultTrainer):
        @classmethod
        def build_evaluator(cls, cfg, dataset_name, output_folder=None):
            if output_folder is None:
                output_folder = os.path.join(cfg.OUTPUT_DIR, "inference")
            if "coco" in dataset_name:
                return COCOEvaluator(dataset_name, output_dir=output_folder)
            if "voc" in dataset_name:
                return PascalVOCDetectionEvaluator(dataset_name)
            raise NotImplementedError(dataset_name)

    def setup(args):
        cfg = get_cfg()
        cfg.merge_from_file(args.config_file)
        cfg.merge_from_list(args.opts)
        cfg.freeze()
        default_setup(cfg, args)
        return cfg

    def main(args):
        cfg = setup(args)
        if args.eval_only:
            model = Trainer.build_model(cfg)
            DetectionCheckpointer(model, save_dir=cfg.OUTPUT_DIR).resume_or_load(
                cfg.MODEL.WEIGHTS, resume=args.resume)
            return Trainer.test(cfg, model)
        trainer = Trainer(cfg)
        trainer.resume_or_load(resume=args.resume)
        return trainer.train()


if __name__ == "__main__":
    if not HAVE_D2:
        raise SystemExit("detectron2 is required for transfer evaluation: "
                         "pip install detectron2 (see README.md)")
    args = default_argument_parser().parse_args()
    launch(main, args.num_gpus, num_machines=args.num_machines,
           machine_rank=args.machine_rank, dist_url=args.dist_url,
           args=(args,))
