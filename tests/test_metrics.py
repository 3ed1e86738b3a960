"""MetricsLogger: JSONL stream + native TensorBoard event files.

The tfevents writer (utils/tb_writer.py) is validated by reading its
output back with TensorBoard's own event_accumulator — the same consumer
a user of the reference's tensorboardX streams would point at the logdir
(reference core/train.py:191-195).
"""

import json
import os

import numpy as np
import pytest

from swinvox_tpu.utils.metrics_logger import MetricsLogger
from swinvox_tpu.utils.tb_writer import EventFileWriter, _crc32c, _masked_crc


def test_crc32c_known_vectors():
    # RFC 3720 / golang crc32 Castagnoli test vectors
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"a") == 0xC1D04330


def _read_events(log_dir):
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator"
    )
    acc = ea_mod.EventAccumulator(
        log_dir, size_guidance={"scalars": 0, "images": 0}
    )
    acc.Reload()
    return acc


def test_event_file_readable_by_tensorboard(tmp_path):
    d = str(tmp_path / "tb")
    w = EventFileWriter(d)
    for step in range(5):
        w.add_scalar("EncoderDecoder/BatchLoss", 1.0 / (step + 1), step)
    w.add_scalar("Refiner/IoU", 0.64, 101)
    w.close()

    acc = _read_events(d)
    tags = acc.Tags()["scalars"]
    assert "EncoderDecoder/BatchLoss" in tags
    assert "Refiner/IoU" in tags
    events = acc.Scalars("EncoderDecoder/BatchLoss")
    assert [e.step for e in events] == [0, 1, 2, 3, 4]
    assert events[2].value == pytest.approx(1.0 / 3.0, rel=1e-6)
    iou = acc.Scalars("Refiner/IoU")
    assert iou[0].step == 101 and iou[0].value == pytest.approx(0.64)


def test_event_file_image_readable(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    png_path = str(tmp_path / "img.png")
    fig = plt.figure(figsize=(1, 1))
    fig.savefig(png_path)
    plt.close(fig)

    d = str(tmp_path / "tb")
    logger = MetricsLogger(d, "test")
    logger.add_image("Model00/Reconstructed", png_path, 3)
    logger.close()

    acc = _read_events(os.path.join(d, "test"))
    assert "Model00/Reconstructed" in acc.Tags()["images"]
    img = acc.Images("Model00/Reconstructed")[0]
    assert img.step == 3
    with open(png_path, "rb") as f:
        assert img.encoded_image_string == f.read()


def test_metrics_logger_writes_both_streams(tmp_path):
    d = str(tmp_path / "logs")
    logger = MetricsLogger(d, "train")
    logger.add_scalar("Refiner/BatchLoss", 0.25, 7)
    logger.close()

    with open(os.path.join(d, "train.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert rows[0]["tag"] == "Refiner/BatchLoss"
    assert rows[0]["value"] == 0.25 and rows[0]["step"] == 7

    acc = _read_events(os.path.join(d, "train"))
    ev = acc.Scalars("Refiner/BatchLoss")[0]
    assert ev.step == 7 and ev.value == pytest.approx(0.25)


def test_metrics_logger_tensorboard_optional(tmp_path):
    d = str(tmp_path / "logs")
    logger = MetricsLogger(d, "train", tensorboard=False)
    logger.add_scalar("x", 1.0, 0)
    logger.add_image("x", "/nonexistent.png", 0)  # no-op, no crash
    logger.close()
    assert not [
        f for f in os.listdir(d) if not f.endswith(".jsonl")
    ], "no tb dir expected"
