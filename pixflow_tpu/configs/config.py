"""Typed configuration, replacing the reference's argparse surface
(`contrast/option.py:10-121`) and the env-var shell recipes layered on top
(`tools/pretrain_bdd100k_job_base.sh`). Every reference flag has a field here;
TPU-specific knobs (compute dtype, mesh) are additive.

Configs serialize to/from JSON (reference dumps `config.json`,
`main_pretrain.py:381-384`)."""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass
class DataConfig:
    data_dir: str = "./data"
    dataset: str = "bdd100k"           # 'ImageNet' | 'bdd100k'
    ann_file: str = ""
    zip_mode: bool = False             # reference --zip
    cache_mode: str = "part"           # 'no' | 'full' | 'part'
    aug: str = "BYOL"                  # 'NULL','InstDisc','MoCov2','SimCLR','RandAug','BYOL','val'
    crop: float = 0.08                 # minimum crop scale
    crop_ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    image_size: int = 224
    n_frames: int = 1
    num_workers: int = 4
    # JPEG DCT-domain decode downscale (1 = full fidelity; 2 = ~4x cheaper
    # host decode, near-identical pair geometry — O(1/W) boundary effects,
    # ~0.25% of threshold-straddling pairs flip; tested >99% mask agreement)
    decode_scale: int = 1
    # native ROI decode (libjpeg band decode fused with the crop+resize);
    # identical crop sampling, fastest host path
    native_decode: bool = False
    # with native_decode + byte cache: lossless per-MCU-row restart-marker
    # transcode at cache time, so crop decodes entropy-decode only their own
    # band (identical pixels; disk corpora: tools/transcode_restart.py)
    restart_transcode: bool = False
    # 'thread' (in-process pool) or 'process' (forked decode
    # workers, the reference DataLoader model; GIL-free)
    worker_mode: str = "thread"
    # 'native' (ShardedLoader) or 'grain' (Google Grain worker
    # orchestration — multi-host pods; data/grain_loader.py)
    loader_backend: str = "native"
    # photometric augmentation on the TPU (ops/augment.py): the host only
    # decodes/crops/flips and samples parameters — frees ~10 ms of PIL work
    # per sample pair; crop/flip geometry is rng-stream-identical
    device_aug: bool = False
    batch_size: int = 64               # per replica (reference: per GPU)
    # transfer efficiency: ship uint8 crops (normalize on device) and f16
    # flow windows; 4x / 2x less host->device traffic, numerically benign
    uint8_transfer: bool = True
    flow_transfer_dtype: str = "float16"


@dataclass
class FlowConfig:
    use_flow: bool = False
    use_flow_file: bool = False
    flow_root: str = ""
    fwd_name: str = "forward"
    bwd_name: str = "backward"
    flow_model: str = ""               # RAFT checkpoint (on-the-fly path)
    small: bool = False                # RAFT-small (inferred from ckpt name)
    flow_up: bool = False              # upflow8 before composing
    flow_up_lazy: bool = True          # point-domain flow_up (exact, fast);
                                       # False materializes full-res fields
    flow_cat_norm: bool = False        # compose in normalized units
    use_flow_frames: bool = False      # all (span,start) compositions
    alpha1: Optional[float] = None     # cycle-consistency coefficients
    alpha2: Optional[float] = None
    flow_bs: Optional[int] = None      # live-RAFT micro-batch; None = 4 per
                                       # device (measured sweet spot), <=0 =
                                       # unchunked full batch
    raft_iters: int = 12
    raft_dtype: str = "float32"        # 'float32' | 'bfloat16' compute dtype
                                       # for on-the-fly RAFT (weights stay
                                       # f32; bf16 measured near-neutral on
                                       # v5e and the GRU refinement amplifies
                                       # rounding — docs/PERF.md)
    raft_corr_dtype: str = "follow"    # corr-pyramid HBM storage dtype
                                       # ('follow' tracks raft_dtype): the
                                       # pyramid is the refinement loop's
                                       # dominant HBM traffic, f32 compute +
                                       # bf16 storage is the accuracy-cheap
                                       # fast mode (docs/PERF.md)


@dataclass
class ModelConfig:
    model: str = "PixPro"
    arch: str = "resnet50"
    feature_dim: int = 256
    head_type: str = "early_return"
    pixpro_p: float = 1.0
    pixpro_momentum: float = 0.99
    pixpro_pos_ratio: float = 0.7
    pixpro_clamp_value: float = 0.0
    pixpro_transform_layer: int = 0
    pixpro_ins_loss_weight: float = 0.0
    # run both views through each branch as one fused 2B pass (per-view BN
    # statistics preserved — models/norm.py; exactly the reference math at
    # ~15% higher step rate). Auto-disabled for multi-span training.
    fuse_views: bool = True


@dataclass
class OptimConfig:
    optimizer: str = "lars"            # 'sgd' | 'lars'
    base_lr: float = 1.0               # per-256 base (pretrain) / absolute (linear)
    lr_scheduler: str = "cosine"       # 'cosine' | 'step'
    warmup_epoch: int = 5
    warmup_multiplier: float = 100.0
    lr_decay_epochs: Sequence[int] = (120, 160, 200)
    lr_decay_rate: float = 0.1
    weight_decay: float = 1e-5
    momentum: float = 0.9
    epochs: int = 100
    start_epoch: int = 1


@dataclass
class RuntimeConfig:
    output_dir: str = "./output"
    auto_resume: bool = False
    resume: str = ""
    pretrained_model: str = ""
    print_freq: int = 100
    save_freq: int = 10
    debug: bool = False
    debug_epochs: Optional[int] = None
    verbose: bool = False
    seed: int = 0
    # TPU-native knobs
    compute_dtype: str = "bfloat16"    # 'bfloat16' | 'float32' (amp O1-ish vs O0)
    mesh_shape: Optional[int] = None   # data-parallel mesh size; None = all devices
    profile_dir: str = ""              # write a jax.profiler trace of steps 10-15
    # per-step mask-ratio telemetry is a strided exact-sample estimate
    # (ops/flow_points.py:mask_ratio_estimate, +-0.08 tested); this computes
    # the reference-exact full-field ratio (util.py:360-366) for the logged
    # batch at every print_freq interval (materializing pass, telemetry only)
    mask_ratio_exact: bool = False
    # 'msgpack' (single atomic file, utils/checkpoint.py) or 'orbax'
    # (multi-host CheckpointManager saves, utils/checkpoint_orbax.py)
    checkpoint_backend: str = "msgpack"
    # multi-process runs vote on SIGTERM preemption by a host allgather;
    # voting every step would add a blocking cross-process sync per batch,
    # so ranks vote only every N batches (all at the same indices) plus at
    # end-of-epoch. Response latency <= N steps, well inside preemption
    # grace windows. Single-process runs poll the local flag every step.
    preempt_vote_steps: int = 16
    tensorboard: bool = True           # tf.summary scalars next to metrics.jsonl
    wandb: bool = False
    wandb_project: str = "pixflow-tpu"
    wandb_entity: str = ""


@dataclass
class PretrainConfig:
    data: DataConfig = field(default_factory=DataConfig)
    flow: FlowConfig = field(default_factory=FlowConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    def to_json(self, **kw) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str, **kw)

    @classmethod
    def from_dict(cls, d: dict) -> "PretrainConfig":
        return cls(
            data=DataConfig(**d.get("data", {})),
            flow=FlowConfig(**d.get("flow", {})),
            model=ModelConfig(**d.get("model", {})),
            optim=OptimConfig(**d.get("optim", {})),
            runtime=RuntimeConfig(**d.get("runtime", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "PretrainConfig":
        return cls.from_dict(json.loads(s))


@dataclass
class LinearConfig:
    """Linear-probe stage (reference `main_linear.py` + option stage='linear')."""
    data: DataConfig = field(default_factory=lambda: DataConfig(
        aug="NULL", crop=0.08, dataset="ImageNet"))
    model: ModelConfig = field(default_factory=lambda: ModelConfig(
        head_type="reduce"))
    optim: OptimConfig = field(default_factory=lambda: OptimConfig(
        optimizer="sgd", base_lr=30.0, weight_decay=0.0, warmup_epoch=0,
        epochs=100))
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)
    total_batch_size: int = 256
    num_classes: int = 1000
    eval_only: bool = False

    def to_json(self, **kw) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str, **kw)

    @classmethod
    def from_dict(cls, d: dict) -> "LinearConfig":
        # absent keys fall through to THIS class's defaults — including the
        # overridden section factories (sgd/base_lr=30/aug=NULL/...), which
        # plain `OptimConfig(**d["optim"])` would silently discard for
        # partial dicts
        base = cls(**{k: d[k] for k in ("total_batch_size", "num_classes",
                                        "eval_only") if k in d})
        return dataclasses.replace(
            base,
            data=dataclasses.replace(base.data, **d.get("data", {})),
            model=dataclasses.replace(base.model, **d.get("model", {})),
            optim=dataclasses.replace(base.optim, **d.get("optim", {})),
            runtime=dataclasses.replace(base.runtime, **d.get("runtime", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "LinearConfig":
        return cls.from_dict(json.loads(s))
