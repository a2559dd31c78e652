#!/usr/bin/env python
"""Export published models as StableHLO serving artifacts (`jax.export`).

The TPU-native counterpart of shipping a torch state_dict (reference
`publish_model.py`): the output file is a self-contained serialized
StableHLO program — weights baked in, ImageNet preprocessing included,
symbolic batch dimension — runnable by any JAX/PJRT runtime on the lowered
platforms (default cpu,tpu) without this package or the model code.

    # pretrained encoder -> feature-map service
    python tools/export_serving.py backbone \
        --ckpt output/published-abcd1234.msgpack --arch resnet50 \
        --out backbone.stablehlo

    # linear-probe classifier -> logits service
    python tools/export_serving.py classifier \
        --ckpt output/linear/current.msgpack --arch resnet50 \
        --num-classes 1000 --out classifier.stablehlo

    # RAFT -> dense-flow service at a fixed frame size
    python tools/export_serving.py raft --ckpt raft_sintel_100000.msgpack \
        --height 720 --width 1280 --out raft.stablehlo

Smoke-test an artifact:
    python - <<'PY'
    from pixflow_tpu.utils.export_hlo import load_serving
    import numpy as np
    fn = load_serving(open("backbone.stablehlo", "rb").read())
    print(fn(np.zeros((2, 224, 224, 3), np.uint8)).shape)
    PY
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("export a serving artifact")
    p.add_argument("mode", choices=["backbone", "classifier", "raft"])
    p.add_argument("--ckpt", required=True,
                   help="backbone: published .msgpack; classifier: linear "
                        "TrainState .msgpack; raft: bare-params .msgpack "
                        "(main_raft.py) or torch .pth")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--arch", default="resnet50")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--small", action="store_true", help="RAFT-small")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--batch", type=int, default=None,
                   help="pin a static batch size (default: symbolic 'b')")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms")
    a = p.parse_args()
    platforms = tuple(s.strip() for s in a.platforms.split(",") if s.strip())

    from pixflow_tpu.utils import export_hlo

    if a.mode == "backbone":
        from pixflow_tpu.utils.checkpoint import load_published
        pub = load_published(a.ckpt)
        blob = export_hlo.export_backbone(
            a.arch, pub["params"].get("encoder", pub["params"]),
            pub.get("batch_stats", {}).get("encoder",
                                           pub.get("batch_stats", {})),
            image_size=a.image_size, platforms=platforms, batch=a.batch)
    elif a.mode == "classifier":
        from flax import serialization
        with open(a.ckpt, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        state = serialization.msgpack_restore(payload["state"]) \
            if isinstance(payload.get("state"), bytes) else payload["state"]
        blob = export_hlo.export_classifier(
            a.arch, state["params"], state.get("batch_stats", {}),
            num_classes=a.num_classes, image_size=a.image_size,
            platforms=platforms, batch=a.batch)
    else:  # raft
        if a.ckpt.endswith(".pth"):
            from pixflow_tpu.models.raft.convert import load_raft
            _, variables = load_raft(a.ckpt, small=a.small)
        else:
            import jax
            import jax.numpy as jnp
            from flax import serialization
            from pixflow_tpu.models.raft.raft import RAFT
            model = RAFT(small=a.small)
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            tmpl = model.init(jax.random.PRNGKey(0), dummy, dummy, iters=1)
            with open(a.ckpt, "rb") as f:
                params = serialization.from_bytes(tmpl["params"], f.read())
            variables = {"params": params}
        blob = export_hlo.export_raft(
            variables, a.height, a.width, small=a.small, iters=a.iters,
            platforms=platforms, batch=a.batch)

    with open(a.out, "wb") as f:
        f.write(blob)
    print(f"wrote {a.out} ({len(blob) / 1e6:.1f} MB, "
          f"platforms={','.join(platforms)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
