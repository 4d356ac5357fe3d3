"""Scalar metric writer.

The reference logs train/val scalars to TensorBoard (reference
scripts/train.py:73-74,120,209-211).  Here scalars go to BOTH:

- a native TensorBoard event file written by the dependency-free
  utils/tfevents.py encoder (importing torch's SummaryWriter pulls in
  the tensorboard package, which imports TensorFlow when present — TF
  then attempts to claim the TPU and deadlocks against JAX; the native
  encoder has no such hazard), and
- a greppable metrics.jsonl.

GG_TENSORBOARD=0 disables the event file (JSONL only).
"""

import json
import os
import time


class MetricWriter:
    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        if os.environ.get("GG_TENSORBOARD") != "0":
            from .tfevents import TFEventsWriter
            self._tb = TFEventsWriter(log_dir)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def add_scalar(self, tag, value, step):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "ts": time.time()}) + "\n")

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.flush()
        self._jsonl.close()
