"""Offline dataset statistics (reference utils/dataset_analyzer.py):
recursive per-channel mean/std over a directory of images."""

from __future__ import annotations

import os
from typing import Iterable, Tuple

import numpy as np

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def iter_image_paths(root: str) -> Iterable[str]:
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            if name.lower().endswith(IMAGE_EXTS):
                yield os.path.join(dirpath, name)


def compute_mean_std(root: str, max_images: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
    """Streaming per-channel mean/std over all images under root (in [0,1])."""
    from swinvox_tpu.data.pipeline import load_image_bgr

    count = 0
    total = np.zeros(3, np.float64)
    total_sq = np.zeros(3, np.float64)
    n_pixels = 0
    for i, path in enumerate(iter_image_paths(root)):
        if max_images is not None and i >= max_images:
            break
        img = load_image_bgr(path)[..., :3].astype(np.float64)
        total += img.sum(axis=(0, 1))
        total_sq += (img**2).sum(axis=(0, 1))
        n_pixels += img.shape[0] * img.shape[1]
        count += 1
    if n_pixels == 0:
        raise ValueError(f"No images found under {root}")
    mean = total / n_pixels
    std = np.sqrt(np.maximum(total_sq / n_pixels - mean**2, 0.0))
    return mean, std


def main(argv=None) -> int:
    import argparse

    parser = argparse.ArgumentParser(description="Dataset mean/std analyzer")
    parser.add_argument("root")
    parser.add_argument("--max-images", type=int, default=None)
    args = parser.parse_args(argv)
    mean, std = compute_mean_std(args.root, args.max_images)
    print(f"mean (BGR): {mean.tolist()}")
    print(f"std  (BGR): {std.tolist()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
