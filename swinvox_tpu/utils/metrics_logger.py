"""Scalar/image metrics logging.

Replaces the reference's TensorBoardX writers (core/train.py:194-195,
303-306) with BOTH of:
  * an append-only JSONL stream per run — trivially greppable, plottable,
    and diffable, and
  * native TensorBoard event files (utils/tb_writer.py) with the
    reference's tag names ('EncoderDecoder/BatchLoss', 'Refiner/IoU', ...)
    so an existing `tensorboard --logdir` workflow keeps working.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from swinvox_tpu.utils.tb_writer import EventFileWriter


class MetricsLogger:
    def __init__(self, log_dir: str, name: str = "metrics", tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        # one events dir per stream, like the reference's train/test
        # SummaryWriter pair (core/train.py:194-195)
        self._tb: Optional[EventFileWriter] = (
            EventFileWriter(os.path.join(log_dir, name)) if tensorboard else None
        )

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
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def add_image(self, tag: str, png_path: str, step: int) -> None:
        """Attach a PNG (e.g. a voxel render) to the TensorBoard stream —
        the analogue of the reference's add_image of get_volume_views output
        (core/test.py:179-187)."""
        if self._tb is None:
            return
        try:
            with open(png_path, "rb") as f:
                png = f.read()
            w, h = _png_size(png)
            self._tb.add_image_png(tag, png, int(step), h, w)
        except (OSError, ValueError):
            pass

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def _png_size(png: bytes) -> tuple:
    if png[:8] != b"\x89PNG\r\n\x1a\n" or len(png) < 24:
        raise ValueError("not a PNG")
    import struct

    w, h = struct.unpack(">II", png[16:24])
    return w, h
