"""Voxel visualization (reference utils/helpers.py:50-88,
utils/binvox_rw.py:306-343): matplotlib 3D voxel renders saved as PNG and
returned as CHW arrays for metric loggers."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def get_volume_views(
    volume: np.ndarray,
    save_dir: str,
    prefix: str,
    sample_idx: int,
    epoch_idx: int,
    threshold: float = 0.5,
) -> np.ndarray:
    """Render a voxel volume (values in [0,1]) >= threshold to a PNG.

    Returns the image as a CHW uint8 array (the reference feeds this to
    TensorBoard, core/test.py:179-187).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    volume = np.squeeze(volume)
    os.makedirs(save_dir, exist_ok=True)
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.voxels(volume >= threshold, edgecolor="#44444422")
    ax.set_box_aspect((1, 1, 1))
    ax.view_init(elev=30, azim=45)
    ax.set_axis_off()
    path = os.path.join(save_dir, f"{prefix}-e{epoch_idx:03d}-s{sample_idx:02d}.png")
    fig.savefig(path, bbox_inches="tight", dpi=100)
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return img.transpose(2, 0, 1)


def save_voxel_image_3d(
    voxels, filename: str, figsize=(12, 12), dpi: int = 150
) -> None:
    """Standalone pretty render of a binvox Voxels model
    (reference binvox_rw.py:306-343)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = voxels.data if hasattr(voxels, "data") else np.asarray(voxels)
    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(111, projection="3d", proj_type="ortho")
    ax.voxels(data, edgecolor="#444444", facecolors="#1f77b488", linewidth=1)
    ax.set_box_aspect((1, 1, 1))
    ax.view_init(elev=30, azim=45)
    ax.set_axis_off()
    plt.tight_layout()
    plt.savefig(filename, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
