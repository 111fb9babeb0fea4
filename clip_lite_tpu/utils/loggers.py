"""Experiment metric sinks: JSONL (always), TensorBoard and wandb (gated).

The reference logs train/val loss components to wandb on the master rank
(reference: train.py:132,235-248) and TensorBoard in downstream drivers
(linear_clf.py:234).  Single-controller JAX has no rank gating; this
writer fans out to whichever sinks are available:

  * metrics.jsonl — machine-readable, always on;
  * TensorBoard — via tf.summary when tensorflow is importable;
  * wandb — when the package is importable AND WANDB_API_KEY/offline
    mode is configured (never required).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional

logger = logging.getLogger("clip_lite_tpu")


class MetricsWriter:
    def __init__(self, serialization_dir: str, use_tensorboard: bool = True,
                 use_wandb: bool = True, config: Optional[dict] = None):
        # Multi-host: metric sinks live on host 0 only (the reference's
        # master-only wandb logging, train.py:132,235-248); other hosts
        # get a writer whose write() is a no-op.
        from clip_lite_tpu.parallel.distributed import is_primary_host

        self._active = is_primary_host()  # True on single-host runs
        self._jsonl = None
        self._tb = None
        self._wandb = None
        if not self._active:
            return
        os.makedirs(serialization_dir, exist_ok=True)
        self._jsonl = open(os.path.join(serialization_dir, "metrics.jsonl"),
                           "a")

        if use_tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(serialization_dir, "tb"))
            except Exception:
                logger.info("TensorBoard unavailable; jsonl only.")
        if use_wandb:
            try:
                import wandb

                if wandb.run is None and (
                        os.environ.get("WANDB_API_KEY")
                        or os.environ.get("WANDB_MODE") == "offline"):
                    wandb.init(config=config or {})
                self._wandb = wandb if getattr(wandb, "run", None) else None
            except Exception:
                self._wandb = None

    def write(self, step: int, metrics: Dict[str, float],
              split: str = "train") -> None:
        if not self._active:
            return
        record = {"iteration": step, "split": split,
                  **{k: float(v) for k, v in metrics.items()}}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(f"{split}/{k}", float(v), step=step)
        if self._wandb is not None:
            self._wandb.log({f"{k}_{split}": float(v)
                             for k, v in metrics.items()}, step=step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
