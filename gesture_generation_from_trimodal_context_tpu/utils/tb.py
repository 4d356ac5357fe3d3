"""Scalar metric writer.

The reference logs train/val scalars to TensorBoard (reference
scripts/train.py:73-74,120,209-211).  Default here is a JSONL metrics
file: importing torch's SummaryWriter pulls in TensorFlow on some
machines, and TF then attempts to claim the TPU and deadlocks against
JAX.  Set GG_TENSORBOARD=1 to opt into real TensorBoard event files.
"""

import json
import os
import time


class MetricWriter:
    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        self._jsonl = None
        if os.environ.get("GG_TENSORBOARD") == "1":
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                pass
        if self._tb is None:
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def add_scalar(self, tag, value, step):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        else:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "ts": time.time()}) + "\n")

    def close(self):
        if self._tb is not None:
            self._tb.close()
        else:
            self._jsonl.flush()
            self._jsonl.close()
