"""binvox voxel-file codec (run-length-encoded occupancy grids).

Re-implements the behavior of the reference codec
(/root/reference/utils/binvox_rw.py:106-292) with fully vectorized numpy
RLE encode/decode — the reference's writer is a per-voxel Python state
machine; ours computes run boundaries with np.diff and emits the byte
stream in one shot, which matters because the ShapeNet pipeline decodes
~30k volumes per epoch.

File format (http://www.patrickmin.com/binvox):
    #binvox 1
    dim 32 32 32
    translate tx ty tz
    scale s
    data
    <value, count> byte pairs, counts <= 255, voxels in x-z-y order
    (y fastest), i.e. index = x*d*d + z*d + y.

When ``fix_coords`` is on (the default, matching the reference), the decoded
dense array is transposed from the file's (x, z, y) layout to (x, y, z).
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import BinaryIO, List, Sequence, Union

import numpy as np

__all__ = [
    "Voxels",
    "read_header",
    "read_as_3d_array",
    "read_as_coord_array",
    "dense_to_sparse",
    "sparse_to_dense",
    "write",
    "loads",
    "dumps",
]


@dataclass
class Voxels:
    """A binvox model: dense bool grid or 3xN sparse coords + metadata.

    Voxel (i, j, k) maps to model coordinates via
        x = scale * (i + .5) / dims[0] + translate[0]   (similarly y, z).
    """

    data: np.ndarray
    dims: List[int]
    translate: List[float]
    scale: float
    axis_order: str = "xyz"

    def __post_init__(self) -> None:
        if self.axis_order not in ("xzy", "xyz"):
            raise ValueError(f"unsupported axis order {self.axis_order!r}")

    def clone(self) -> "Voxels":
        return Voxels(
            self.data.copy(),
            list(self.dims),
            list(self.translate),
            self.scale,
            self.axis_order,
        )

    def write(self, fp: BinaryIO) -> None:
        write(self, fp)


def read_header(fp: BinaryIO):
    """Parse the 5-line ASCII header; returns (dims, translate, scale)."""
    first = fp.readline().strip()
    if not first.startswith(b"#binvox"):
        raise IOError("Not a binvox file")
    dims = translate = None
    scale = 1.0
    while True:
        line = fp.readline()
        if not line:
            raise IOError("binvox header ended before 'data' line")
        tokens = line.strip().split()
        if not tokens:
            continue
        key = tokens[0]
        if key == b"dim":
            dims = [int(t) for t in tokens[1:]]
        elif key == b"translate":
            translate = [float(t) for t in tokens[1:]]
        elif key == b"scale":
            scale = float(tokens[1])
        elif key == b"data":
            break
        else:
            raise IOError(f"unexpected binvox header token {key!r}")
    if dims is None:
        raise IOError("binvox header missing 'dim' line")
    if translate is None:
        translate = [0.0, 0.0, 0.0]
    return dims, translate, scale


def _decode_rle(raw: np.ndarray, n_voxels: int) -> np.ndarray:
    """Expand <value, count> byte pairs into a flat bool array.

    Uses the native C++ single-pass decoder when available (the data
    pipeline decodes ~30k volumes per ShapeNet epoch), else numpy repeat.
    """
    if raw.size % 2 != 0:
        raise IOError("binvox RLE payload has odd length")
    from swinvox_tpu.native import get_lib

    lib = get_lib()
    if lib is not None:
        out = np.empty(n_voxels, np.uint8)
        import ctypes

        n = lib.voxcodec_decode(
            raw.tobytes(), raw.size, out.ctypes.data_as(ctypes.c_void_p), n_voxels
        )
        if n != n_voxels:
            raise IOError(
                f"binvox RLE decoded {n} voxels, expected {n_voxels}"
            )
        return out.astype(bool)
    values, counts = raw[::2], raw[1::2]
    flat = np.repeat(values, counts).astype(bool)
    if flat.size != n_voxels:
        raise IOError(
            f"binvox RLE decoded {flat.size} voxels, expected {n_voxels}"
        )
    return flat


def read_as_3d_array(fp: BinaryIO, fix_coords: bool = True) -> Voxels:
    """Read a binvox file into a dense 3D bool array.

    Matches the reference reader (binvox_rw.py:119-153) including the
    xzy -> xyz transpose when ``fix_coords`` is set.
    """
    dims, translate, scale = read_header(fp)
    raw = np.frombuffer(fp.read(), dtype=np.uint8)
    flat = _decode_rle(raw, int(np.prod(dims)))
    data = flat.reshape(dims)
    if fix_coords:
        data = np.transpose(data, (0, 2, 1))
        axis_order = "xyz"
    else:
        axis_order = "xzy"
    return Voxels(data, dims, translate, scale, axis_order)


def read_as_coord_array(fp: BinaryIO, fix_coords: bool = True) -> Voxels:
    """Read a binvox file as a 3xN array of nonzero voxel coordinates.

    Vectorized equivalent of the reference reader (binvox_rw.py:156-204):
    instead of a Python loop materializing every index in each run, we build
    the flat index list with arange arithmetic over run boundaries.
    """
    dims, translate, scale = read_header(fp)
    raw = np.frombuffer(fp.read(), dtype=np.uint8)
    values, counts = raw[::2], raw[1::2]
    ends = np.cumsum(counts.astype(np.int64))
    starts = ends - counts
    occupied = values.astype(bool)
    starts, ends = starts[occupied], ends[occupied]
    lengths = ends - starts
    total = int(lengths.sum())
    if total == 0:
        flat_idx = np.empty((0,), dtype=np.int64)
    else:
        # offsets[i] = position of run i's first voxel in the output
        offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        flat_idx = np.repeat(starts - offsets, lengths) + np.arange(total)
    # file layout: index = x * (d*d) + z * d + y
    x = flat_idx // (dims[0] * dims[1])
    zwpy = flat_idx % (dims[0] * dims[1])
    z = zwpy // dims[0]
    y = zwpy % dims[0]
    if fix_coords:
        data = np.vstack((x, y, z))
        axis_order = "xyz"
    else:
        data = np.vstack((x, z, y))
        axis_order = "xzy"
    return Voxels(
        np.ascontiguousarray(data), dims, translate, scale, axis_order
    )


def dense_to_sparse(voxel_data: np.ndarray, dtype=int) -> np.ndarray:
    """Dense 3D grid -> 3xN coordinate array (no axis reordering)."""
    if voxel_data.ndim != 3:
        raise ValueError("voxel_data should be a 3D array")
    return np.asarray(np.nonzero(voxel_data), dtype)


def sparse_to_dense(
    voxel_data: np.ndarray, dims: Union[int, Sequence[int]], dtype=bool
) -> np.ndarray:
    """3xN coordinate array -> dense grid; out-of-range voxels dropped."""
    if voxel_data.ndim != 2 or voxel_data.shape[0] != 3:
        raise ValueError("voxel_data should be a 3xN array")
    if np.isscalar(dims):
        dims = [int(dims)] * 3
    dims = list(dims)
    xyz = voxel_data.astype(np.int64)
    valid = np.all((xyz >= 0) & (xyz < np.asarray(dims)[:, None]), axis=0)
    xyz = xyz[:, valid]
    out = np.zeros(dims, dtype=dtype)
    out[tuple(xyz)] = True
    return out


def _encode_rle(flat: np.ndarray) -> bytes:
    """Vectorized RLE: <value, count> pairs with counts capped at 255."""
    flat = flat.astype(np.uint8)
    if flat.size == 0:
        return b""
    from swinvox_tpu.native import get_lib

    lib = get_lib()
    if lib is not None:
        import ctypes

        flat = np.ascontiguousarray(flat)
        # worst case: alternating values -> 2 bytes per voxel
        out = np.empty(2 * flat.size, np.uint8)
        n = lib.voxcodec_encode(
            flat.ctypes.data_as(ctypes.c_void_p),
            flat.size,
            out.ctypes.data_as(ctypes.c_void_p),
            out.size,
        )
        if n >= 0:
            return out[:n].tobytes()
    # boundaries where the value changes
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [flat.size]))
    values = flat[starts]
    lengths = (ends - starts).astype(np.int64)
    # split runs longer than 255 into ceil(len/255) chunks
    n_chunks = (lengths + 254) // 255
    out_values = np.repeat(values, n_chunks)
    out_counts = np.full(out_values.shape, 255, dtype=np.int64)
    # last chunk of each run holds the remainder
    last_pos = np.cumsum(n_chunks) - 1
    remainder = lengths - (n_chunks - 1) * 255
    out_counts[last_pos] = remainder
    pairs = np.empty((out_values.size, 2), dtype=np.uint8)
    pairs[:, 0] = out_values
    pairs[:, 1] = out_counts.astype(np.uint8)
    return pairs.tobytes()


def write(voxel_model: Voxels, fp: BinaryIO) -> None:
    """Write a Voxels model in binary binvox format.

    Behavior-compatible with the reference writer (binvox_rw.py:239-292)
    but encodes the whole run-length stream vectorized.  Note the reference
    emits a 255-count pair then *restarts the counter including the current
    voxel*, so its chunking differs cosmetically for runs > 255; both decode
    to identical grids.
    """
    if voxel_model.data.ndim == 2:
        dense = sparse_to_dense(voxel_model.data, voxel_model.dims).astype(
            np.uint8
        )
    else:
        dense = voxel_model.data.astype(np.uint8)

    header = (
        "#binvox 1\n"
        f"dim {' '.join(str(d) for d in voxel_model.dims)}\n"
        f"translate {' '.join(str(t) for t in voxel_model.translate)}\n"
        f"scale {voxel_model.scale}\n"
        "data\n"
    )
    fp.write(header.encode("latin-1"))

    if voxel_model.axis_order == "xzy":
        flat = dense.reshape(-1)
    else:  # xyz in memory -> file wants xzy
        flat = np.transpose(dense, (0, 2, 1)).reshape(-1)
    fp.write(_encode_rle(np.ascontiguousarray(flat)))


def loads(buf: bytes, fix_coords: bool = True) -> Voxels:
    """Decode a binvox byte string into a dense Voxels model."""
    return read_as_3d_array(io.BytesIO(buf), fix_coords=fix_coords)


def dumps(voxel_model: Voxels) -> bytes:
    """Encode a Voxels model to a binvox byte string."""
    out = io.BytesIO()
    write(voxel_model, out)
    return out.getvalue()
