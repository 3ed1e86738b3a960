"""Scalar metrics logging.

Replaces the reference's TensorBoardX writers (core/train.py:194-195,
303-306) with an append-only JSONL stream per run — trivially greppable,
plottable, and diffable.  Streams are namespaced by tag like the
reference's 'EncoderDecoder/BatchLoss' etc.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, log_dir: str, name: str = "metrics"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._fh = open(self.path, "a", buffering=1)

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._fh.write(
            json.dumps(
                {
                    "tag": tag,
                    "value": float(value),
                    "step": int(step),
                    "ts": time.time(),
                }
            )
            + "\n"
        )

    def close(self) -> None:
        self._fh.close()
