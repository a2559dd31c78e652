"""Config / CLI surface tests."""

import json
import sys

import pytest

from pixflow_tpu.configs import PretrainConfig, get_recipe, RECIPES


def test_recipes_exist_and_match_reference_hparams():
    cfg = get_recipe("pretrain_bdd100k_2000ep_nframe6")
    assert cfg.data.n_frames == 6
    assert cfg.data.batch_size == 64
    assert cfg.model.pixpro_p == 2.0
    assert cfg.model.pixpro_transform_layer == 1
    assert cfg.model.pixpro_pos_ratio == 0.7
    assert cfg.optim.optimizer == "lars"
    assert cfg.optim.base_lr == 1.0
    assert cfg.optim.weight_decay == 1e-5
    assert cfg.optim.warmup_epoch == 5
    assert cfg.optim.epochs == 2000
    assert cfg.flow.use_flow and cfg.flow.use_flow_file
    assert cfg.flow.alpha1 == 0.01 and cfg.flow.alpha2 == 0.5
    assert cfg.flow.small
    # round-5 adjudication (docs/PERF.md): bf16 compute is the shipped
    # dtype for the flow recipes (1.76x interleaved over f32, trajectory
    # gap same order as f32's); --compute-dtype float32 = the reference O0
    assert cfg.runtime.compute_dtype == "bfloat16"

    base = get_recipe("pretrain_bdd100k_2000ep")
    assert base.data.n_frames == 1 and not base.flow.use_flow
    assert base.data.batch_size == 128

    assert set(RECIPES) >= {"pretrain_bdd100k_2000ep",
                            "pretrain_bdd100k_2000ep_nframe2",
                            "pretrain_bdd100k_2000ep_nframe6", "smoke_cpu"}


def test_config_json_roundtrip():
    cfg = get_recipe("pretrain_bdd100k_2000ep_nframe6")
    cfg2 = PretrainConfig.from_json(cfg.to_json())
    assert cfg2.data.n_frames == 6
    assert cfg2.flow.alpha1 == 0.01
    assert json.loads(cfg2.to_json())["model"]["pixpro_p"] == 2.0


def test_linear_config_partial_dict_keeps_linear_defaults():
    """LinearConfig.from_dict on a PARTIAL dict must fall back to the
    LINEAR-stage section defaults (sgd, base_lr 30, NULL aug, reduce head,
    reference `main_linear.py` hparams) — not the pretrain-stage base
    dataclass defaults."""
    from pixflow_tpu.configs import LinearConfig

    cfg = LinearConfig.from_json('{"optim": {"epochs": 50}}')
    assert cfg.optim.epochs == 50                 # the supplied override
    assert cfg.optim.optimizer == "sgd"           # linear defaults kept
    assert cfg.optim.base_lr == 30.0
    assert cfg.optim.weight_decay == 0.0
    assert cfg.optim.warmup_epoch == 0
    assert cfg.data.aug == "NULL"
    assert cfg.data.dataset == "ImageNet"
    assert cfg.model.head_type == "reduce"
    # full round-trip still exact
    cfg2 = LinearConfig.from_json(cfg.to_json())
    assert cfg2.to_json() == cfg.to_json()


def _parse(argv):
    # import OUR main_pretrain explicitly by path: oracle fixtures put
    # /root/reference at sys.path[0], whose own main_pretrain.py (imports
    # wandb) would otherwise shadow ours depending on test order
    import importlib.util
    import os
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mod = sys.modules.get("main_pretrain")
    if mod is None or not getattr(mod, "__file__", "").startswith(repo_root):
        spec = importlib.util.spec_from_file_location(
            "main_pretrain", os.path.join(repo_root, "main_pretrain.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules["main_pretrain"] = mod
        spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["main_pretrain.py"] + argv
    try:
        return mod.parse_args()
    finally:
        sys.argv = old


def test_cli_reference_flag_surface():
    cfg = _parse(["--arch", "resnet50", "--batch-size", "32",
                  "--pixpro-p", "2", "--pixpro-pos-ratio", "0.7",
                  "--use_flow", "--use_flow_file", "--flow_up",
                  "--alpha1", "0.01", "--alpha2", "0.5",
                  "--n-frames", "6", "--optimizer", "lars",
                  "--base-lr", "1.0", "--epochs", "2000",
                  "--flow_model", "weights/raft-small.pth"])
    assert cfg.data.batch_size == 32
    assert cfg.model.pixpro_p == 2.0
    assert cfg.flow.use_flow and cfg.flow.flow_up
    assert cfg.flow.small  # inferred from checkpoint name
    assert cfg.optim.epochs == 2000


def test_cli_recipe_with_overrides():
    cfg = _parse(["--recipe", "pretrain_bdd100k_2000ep_nframe6",
                  "--batch-size", "16", "--epochs", "10"])
    # explicit flags override the recipe...
    assert cfg.data.batch_size == 16
    assert cfg.optim.epochs == 10
    # ...unspecified recipe values survive
    assert cfg.data.n_frames == 6
    assert cfg.flow.alpha1 == 0.01
    assert cfg.model.pixpro_transform_layer == 1


def test_wandb_run_name():
    from pixflow_tpu.utils.logger import wandb_run_name
    cfg = get_recipe("pretrain_bdd100k_2000ep_nframe6")
    name = wandb_run_name(cfg)
    assert "resnet50" in name and "nf6" in name and "flow" in name


def test_cli_round2_flags():
    """fuse_views / worker-mode / decode knobs reach the config; defaults
    pin the documented behavior (fused on, thread workers, full decode)."""
    cfg = _parse([])
    assert cfg.model.fuse_views is True
    assert cfg.data.worker_mode == "thread"
    assert cfg.data.decode_scale == 1
    assert cfg.data.native_decode is False

    cfg = _parse(["--no-fuse_views", "--worker-mode", "process",
                  "--decode-scale", "2", "--native-decode"])
    assert cfg.model.fuse_views is False
    assert cfg.data.worker_mode == "process"
    assert cfg.data.decode_scale == 2
    assert cfg.data.native_decode is True

    # recipes keep the fused default unless explicitly disabled
    cfg = _parse(["--recipe", "pretrain_bdd100k_2000ep_nframe6"])
    assert cfg.model.fuse_views is True


def test_cli_raft_dtype_flag():
    """--raft_dtype / --raft_corr_dtype reach FlowConfig; defaults stay
    f32/follow (the oracle-exact path)."""
    cfg = _parse([])
    assert cfg.flow.raft_dtype == "float32"
    assert cfg.flow.raft_corr_dtype == "follow"
    cfg = _parse(["--use_flow", "--flow_model", "raft-small.pth",
                  "--raft_dtype", "bfloat16",
                  "--raft_corr_dtype", "bfloat16"])
    assert cfg.flow.raft_dtype == "bfloat16"
    assert cfg.flow.raft_corr_dtype == "bfloat16"


def test_multihost_rendezvous_missing_vars_fail_fast():
    """Partial rendezvous config must fail loudly, not hang the pod."""
    import os
    import subprocess
    import sys
    env = dict(os.environ, JAX_COORDINATOR_ADDRESS="127.0.0.1:12345")
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_PROCESS_ID", None)
    r = subprocess.run(
        [sys.executable, "main_pretrain_multihost.py"], env=env,
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode != 0
    assert "rendezvous variables are required" in (r.stderr + r.stdout)


def test_live_flow_micro_batch_policy():
    """The live-RAFT chunking policy (driver.live_flow_micro_batch):
    unset -> 4/device (mesh-scaled), <=0 -> unchunked, explicit wins."""
    from pixflow_tpu.train.driver import live_flow_micro_batch
    assert live_flow_micro_batch(None, 1) == 4
    assert live_flow_micro_batch(None, 8) == 32
    assert live_flow_micro_batch(0, 8) is None
    assert live_flow_micro_batch(-1, 1) is None
    assert live_flow_micro_batch(16, 8) == 16
