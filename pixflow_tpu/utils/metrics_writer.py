"""Training-metric sinks: JSONL file (always) + TensorBoard + wandb (gated).

Capability of the reference's TensorBoard/wandb streaming
(`main_pretrain.py:326-371`): per-step scalars — lr, loss, loss+4, positive-
pair counts/means, mask ratios, frame telemetry — written where dashboards
can read them. The JSONL file doubles as the loss-curve artifact for parity
comparisons."""

from __future__ import annotations

import json
import os

class MetricsWriter:
    def __init__(self, output_dir: str, use_tensorboard: bool = True,
                 wandb_run=None, filename: str = "metrics.jsonl"):
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = open(os.path.join(output_dir, filename), "a",
                           buffering=1)
        self._wandb = wandb_run
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(
                    os.path.join(output_dir, "tb"))
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: dict):
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=int(step))
        if self._wandb is not None:
            self._wandb.log(rec, step=int(step))

    def save_artifacts(self, output_dir: str):
        """End-of-run artifact upload: attach the config dump, the JSONL
        loss curve, and any TensorBoard event files to the wandb run
        (reference `main_pretrain.py:397-400` wandb.save of events.*)."""
        if self._wandb is None:
            return
        import glob
        paths = [os.path.join(output_dir, "config.json"),
                 os.path.join(output_dir, "metrics.jsonl")]
        paths += glob.glob(os.path.join(output_dir, "tb", "events.*"))
        paths += glob.glob(os.path.join(output_dir, "events.*"))
        for path in paths:
            if os.path.exists(path):
                self._wandb.save(path, base_path=output_dir)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
