"""pixflow-tpu: TPU-native pixel-level contrastive pretraining with optical flow.

A brand-new JAX/Flax/pjit/Pallas framework with the capabilities of
rioyokotalab/PixPro-with-OpticalFlow (PixPro pixel-level BYOL pretraining on
driving videos, extended with RAFT optical-flow coordinate warping and
cycle-consistency occlusion masking).

Layout:
    configs/   typed dataclass configs (replaces reference contrast/option.py)
    ops/       pure-function math core: resampling, flow composition, loss geometry
    models/    Flax modules: ResNet zoo, MLP2d heads, PixPro, RAFT
    parallel/  mesh setup + collectives (replaces NCCL/DDP/SyncBN wiring)
    train/     optax LARS, schedules, EMA, the pjit train step
    data/      host-side pipeline: video sampling, coord-tracked augs, flow files
    eval/      linear probe, detectron2 export
    utils/     logging, meters, checkpointing
"""

__version__ = "0.1.0"
