"""StableHLO serving export (`jax.export`) for published models.

The reference ships models as raw torch state_dicts (`publish_model.py`):
every consumer must re-instantiate the Python model classes to run them.
The TPU-native serving artifact is instead a serialized StableHLO function
— the traced forward pass with the weights embedded as constants — that
any JAX (or PJRT-hosted) runtime can deserialize and execute WITHOUT this
package, flax, or the model code, on the platforms it was lowered for
(default: cpu + tpu), with a symbolic (polymorphic) batch dimension.

Three export surfaces, matching what the reference publishes or serves:

  * backbone   — the pretrained encoder as a feature extractor
                 (uint8 [B,H,W,3] -> [B,H/32,W/32,C] feature map, the
                 `early_return` head PixPro trains; ImageNet normalization
                 is baked in).
  * classifier — backbone + linear-probe fc (uint8 [B,H,W,3] ->
                 [B,num_classes] logits), i.e. the deployable artifact of
                 `main_linear.py`.
  * raft       — optical flow (two uint8 [B,H,W,3] frames -> [B,H,W,2]
                 flow, reference test_mode output; input padding to /8 and
                 un-padding are baked in for any static H,W).

All entry points return the serialized bytes; `load_serving` restores a
callable for smoke-testing an artifact in-process (parity with the live
model is test-pinned in tests/test_export.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_PLATFORMS = ("cpu", "tpu")


def _export_fn(fn, arg_specs, platforms: Sequence[str]) -> bytes:
    from jax import export
    exp = export.export(jax.jit(fn), platforms=list(platforms))(*arg_specs)
    return bytes(exp.serialize())


def _batch_spec(shape_tail, dtype, batch: Optional[int]) -> jax.ShapeDtypeStruct:
    """Leading-dim spec: symbolic 'b' (default) or a pinned static batch."""
    if batch is None:
        from jax import export
        (b,) = export.symbolic_shape("b")
    else:
        b = batch
    return jax.ShapeDtypeStruct((b,) + tuple(shape_tail), dtype)


def _normalize_uint8(im):
    """uint8 [0,255] -> ImageNet-normalized float32 (the transform every
    recipe applies; `data/transforms.py` mean/std)."""
    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
    x = im.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


# Head modules a checkpoint may legitimately lack (e.g. exporting a
# published encoder into a template that has an fc head). Everything else
# in the template is trunk and MUST come from the checkpoint — otherwise
# we'd silently export random-init weights.
_HEAD_KEYS = frozenset({"fc", "fc1", "fc2", "bn2"})


def _graft(template: dict, loaded: dict) -> dict:
    """Overlay checkpoint subtrees onto an init template (tolerates a
    checkpoint that lacks heads the template has, e.g. fc). Raises if any
    trunk key of the template is missing from the checkpoint — a key-name
    mismatch must fail the export, not trace random weights."""
    missing = [k for k in template if k not in loaded and k not in _HEAD_KEYS]
    if missing:
        raise ValueError(
            "checkpoint does not cover the model trunk — missing keys "
            f"{sorted(missing)} (checkpoint has {sorted(loaded)}); pass the "
            "encoder/probe subtree, not an outer container")
    out = dict(template)
    for k, v in loaded.items():
        if k in out:
            out[k] = jax.tree.map(jnp.asarray, v)
    return out


def _export_resnet(model, params: dict, batch_stats: dict, image_size: int,
                   platforms: Sequence[str], batch: Optional[int]) -> bytes:
    """Shared backbone/classifier export: graft checkpoint trees onto the
    init template, bake in uint8 -> ImageNet normalization, export."""
    im = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    tmpl = model.init(jax.random.PRNGKey(0), im, False)
    variables = {
        "params": _graft(dict(tmpl["params"]), params),
        "batch_stats": _graft(dict(tmpl.get("batch_stats", {})), batch_stats),
    }

    def fn(im_u8):
        return model.apply(variables, _normalize_uint8(im_u8), False)

    spec = _batch_spec((image_size, image_size, 3), jnp.uint8, batch)
    return _export_fn(fn, (spec,), platforms)


def export_backbone(arch: str, params: dict, batch_stats: dict,
                    image_size: int = 224,
                    platforms: Sequence[str] = DEFAULT_PLATFORMS,
                    batch: Optional[int] = None) -> bytes:
    """Pretrained encoder -> feature-map service. `params`/`batch_stats`
    are the published checkpoint's `encoder` subtrees
    (`utils/checkpoint.py:publish_checkpoint`)."""
    from ..models import make_resnet
    model = make_resnet(arch, head_type="early_return")
    return _export_resnet(model, params, batch_stats, image_size,
                          platforms, batch)


def export_classifier(arch: str, params: dict, batch_stats: dict,
                      num_classes: int, image_size: int = 224,
                      platforms: Sequence[str] = DEFAULT_PLATFORMS,
                      batch: Optional[int] = None) -> bytes:
    """Linear-probe model -> logits service. `params`/`batch_stats` are the
    probe TrainState's trees (trunk + fc, `eval/linear.py`)."""
    from ..models import make_resnet
    model = make_resnet(arch, head_type="reduce", low_dim=num_classes)
    return _export_resnet(model, params, batch_stats, image_size,
                          platforms, batch)


def export_raft(variables: dict, height: int, width: int,
                small: bool = False, iters: int = 12,
                pad_mode: str = "sintel",
                platforms: Sequence[str] = DEFAULT_PLATFORMS,
                batch: Optional[int] = None) -> bytes:
    """RAFT -> dense-flow service at a static frame size (any H,W: the /8
    input padding and output un-padding are part of the program). Frames
    are uint8 RGB in [0,255] (what RAFT consumes natively)."""
    from ..models.raft.raft import RAFT
    from ..models.raft.utils import InputPadder
    model = RAFT(small=small)
    padder = InputPadder((height, width), mode=pad_mode)

    def fn(im1_u8, im2_u8):
        i1, i2 = padder.pad(im1_u8.astype(jnp.float32),
                            im2_u8.astype(jnp.float32))
        _, flow_up = model.apply(variables, i1, i2, iters=iters)
        return padder.unpad(flow_up)

    spec = _batch_spec((height, width, 3), jnp.uint8, batch)
    return _export_fn(fn, (spec, spec), platforms)


def load_serving(blob: bytes):
    """Deserialize an exported artifact into a callable (in-process smoke
    testing; production consumers embed the bytes in their own runtime)."""
    from jax import export
    exp = export.deserialize(bytearray(blob))

    def call(*args):
        return exp.call(*[jnp.asarray(np.asarray(a)) for a in args])

    call.in_avals = exp.in_avals
    call.platforms = exp.platforms
    return call
