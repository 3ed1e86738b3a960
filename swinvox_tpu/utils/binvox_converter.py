"""Mesh -> 32^3 binvox conversion (reference utils/binvox_converter.py).

The reference shells out to the external `binvox` voxelizer binary and then
fixes the axis order (binvox_converter.py:47-57).  This version keeps that
path when the binary exists, and adds a pure-Python fallback voxelizer for
OFF meshes (solid fill via parity ray casting along z) so the tool works in
hermetic environments.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional, Tuple

import numpy as np

from swinvox_tpu.data import binvox


def load_off(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse an OFF mesh: returns (vertices [V,3], faces [F,3] int)."""
    with open(path) as f:
        tokens = f.read().split()
    idx = 0
    if tokens[idx] == "OFF":
        idx += 1
    n_verts, n_faces = int(tokens[idx]), int(tokens[idx + 1])
    idx += 3  # skip edge count
    verts = np.array(tokens[idx : idx + 3 * n_verts], np.float64).reshape(-1, 3)
    idx += 3 * n_verts
    faces = []
    for _ in range(n_faces):
        k = int(tokens[idx])
        poly = [int(t) for t in tokens[idx + 1 : idx + 1 + k]]
        idx += 1 + k
        for j in range(1, k - 1):  # fan-triangulate
            faces.append([poly[0], poly[j], poly[j + 1]])
    return verts, np.asarray(faces, np.int64)


def voxelize_mesh(verts: np.ndarray, faces: np.ndarray, d: int = 32) -> np.ndarray:
    """Solid-fill voxelization by z-ray parity counting (watertight meshes)."""
    lo, hi = verts.min(0), verts.max(0)
    scale = (d - 2) / max(float((hi - lo).max()), 1e-9)
    v = (verts - lo) * scale + 1.0  # into [1, d-1)

    xs = (np.arange(d) + 0.5)[:, None]  # voxel centers
    vol = np.zeros((d, d, d), bool)
    tri = v[faces]  # [F, 3, 3]
    # For each (x, y) column, count crossings of triangles below each z.
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    # ray positions avoid exact triangle-seam hits (a ray on the shared
    # diagonal of two triangles would count the crossing twice)
    eps = 7.3e-4
    for xi in range(d):
        px = xi + 0.5 + eps
        for yi in range(d):
            py = yi + 0.5 + eps * 1.37
            # barycentric test in the xy plane
            d1 = (b[:, 0] - a[:, 0]) * (py - a[:, 1]) - (b[:, 1] - a[:, 1]) * (px - a[:, 0])
            d2 = (c[:, 0] - b[:, 0]) * (py - b[:, 1]) - (c[:, 1] - b[:, 1]) * (px - b[:, 0])
            d3 = (a[:, 0] - c[:, 0]) * (py - c[:, 1]) - (a[:, 1] - c[:, 1]) * (px - c[:, 0])
            inside = ((d1 >= 0) & (d2 >= 0) & (d3 >= 0)) | (
                (d1 <= 0) & (d2 <= 0) & (d3 <= 0)
            )
            if not inside.any():
                continue
            t = tri[inside]
            # interpolate z at (px, py) via barycentric coordinates
            det = (t[:, 1, 1] - t[:, 2, 1]) * (t[:, 0, 0] - t[:, 2, 0]) + (
                t[:, 2, 0] - t[:, 1, 0]
            ) * (t[:, 0, 1] - t[:, 2, 1])
            det = np.where(np.abs(det) < 1e-12, 1e-12, det)
            w0 = ((t[:, 1, 1] - t[:, 2, 1]) * (px - t[:, 2, 0]) + (t[:, 2, 0] - t[:, 1, 0]) * (py - t[:, 2, 1])) / det
            w1 = ((t[:, 2, 1] - t[:, 0, 1]) * (px - t[:, 2, 0]) + (t[:, 0, 0] - t[:, 2, 0]) * (py - t[:, 2, 1])) / det
            w2 = 1.0 - w0 - w1
            zcross = w0 * t[:, 0, 2] + w1 * t[:, 1, 2] + w2 * t[:, 2, 2]
            zcross.sort()
            centers = np.arange(d) + 0.5
            parity = (zcross[None, :] < centers[:, None]).sum(1) % 2
            vol[xi, yi] = parity.astype(bool)
    return vol


def convert(
    input_path: str,
    output_path: str,
    d: int = 32,
    binvox_binary: Optional[str] = None,
) -> None:
    """OFF/mesh -> .binvox at resolution d, with the reference's axis fixup."""
    binary = binvox_binary or shutil.which("binvox")
    model = None
    if binary:
        try:
            subprocess.run(
                [binary, "-d", str(d), "-cb", "-e", input_path], check=True
            )
            produced = os.path.splitext(input_path)[0] + ".binvox"
            with open(produced, "rb") as f:
                model = binvox.read_as_3d_array(f, fix_coords=True)
            data = model.data
        except (OSError, subprocess.SubprocessError):
            model = None  # fall through to the pure-Python voxelizer
    if model is None:
        verts, faces = load_off(input_path)
        data = voxelize_mesh(verts, faces, d)
        model = binvox.Voxels(data, [d, d, d], [0.0, 0.0, 0.0], 1.0, "xyz")
    with open(output_path, "wb") as f:
        binvox.write(
            binvox.Voxels(data, [d, d, d], list(getattr(model, "translate", [0, 0, 0])),
                          float(getattr(model, "scale", 1.0)), "xyz"),
            f,
        )


def main(argv=None) -> int:
    import argparse

    parser = argparse.ArgumentParser(description="OFF -> binvox converter")
    parser.add_argument("input")
    parser.add_argument("output")
    parser.add_argument("-d", type=int, default=32)
    args = parser.parse_args(argv)
    convert(args.input, args.output, args.d)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
