"""binvox codec tests.

Ports the reference's only executable tests — the doctests embedded in
/root/reference/utils/binvox_rw.py:17-61 (read/write round trip, dense/sparse
equivalence) — as pytest cases over synthetic volumes, plus RLE edge cases.
"""

import io

import numpy as np
import pytest

from swinvox_tpu.data import binvox


def random_volume(rng, d=32, p=0.2):
    return rng.random((d, d, d)) < p


def blob_volume(d=32):
    """A connected blob (long runs) to exercise RLE chunking."""
    idx = np.arange(d)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    c = (d - 1) / 2
    return ((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) < (d / 3) ** 2


@pytest.mark.parametrize("vol_fn", [random_volume, lambda rng: blob_volume()])
def test_roundtrip_dense(rng, vol_fn):
    vol = vol_fn(rng)
    m1 = binvox.Voxels(vol, [32, 32, 32], [0.0, 0.0, 0.0], 41.133, "xyz")
    buf = binvox.dumps(m1)
    m2 = binvox.loads(buf)
    assert m1.dims == m2.dims
    assert m1.scale == m2.scale
    assert m1.translate == m2.translate
    assert np.all(m1.data == m2.data)


def test_roundtrip_no_fix_coords(rng):
    vol = random_volume(rng)
    m1 = binvox.Voxels(vol, [32, 32, 32], [0.0, 0.0, 0.0], 1.0, "xzy")
    buf = binvox.dumps(m1)
    m2 = binvox.loads(buf, fix_coords=False)
    assert m2.axis_order == "xzy"
    assert np.all(m1.data == m2.data)


def test_fix_coords_transpose(rng):
    """fix_coords transposes the file's (x,z,y) layout to (x,y,z)."""
    vol = random_volume(rng)
    m_xzy = binvox.Voxels(vol, [32, 32, 32], [0.0, 0.0, 0.0], 1.0, "xzy")
    buf = binvox.dumps(m_xzy)
    m_xyz = binvox.loads(buf, fix_coords=True)
    assert np.all(m_xyz.data == np.transpose(vol, (0, 2, 1)))


def test_dense_sparse_equivalence(rng):
    vol = random_volume(rng)
    m = binvox.Voxels(vol, [32, 32, 32], [0.0, 0.0, 0.0], 1.0, "xyz")
    buf = binvox.dumps(m)

    md = binvox.loads(buf)
    ms = binvox.read_as_coord_array(io.BytesIO(buf))

    data_ds = binvox.dense_to_sparse(md.data)
    data_sd = binvox.sparse_to_dense(ms.data, 32)
    assert np.all(data_sd == md.data)
    # same voxel sets after lexical sort (ordering differs between paths)
    assert np.all(
        ms.data[:, np.lexsort(ms.data)] == data_ds[:, np.lexsort(data_ds)]
    )


def test_long_run_chunking():
    """Runs > 255 must split into capped <=255-count pairs."""
    vol = np.ones((32, 32, 32), dtype=bool)  # one run of 32768
    m = binvox.Voxels(vol, [32, 32, 32], [0.0, 0.0, 0.0], 1.0, "xyz")
    buf = binvox.dumps(m)
    payload = buf.split(b"data\n", 1)[1]
    counts = np.frombuffer(payload, dtype=np.uint8)[1::2]
    assert counts.max() <= 255
    assert int(counts.astype(np.int64).sum()) == 32 * 32 * 32
    m2 = binvox.loads(buf)
    assert np.all(m2.data)


def test_empty_and_full_coord_array():
    empty = np.zeros((8, 8, 8), dtype=bool)
    m = binvox.Voxels(empty, [8, 8, 8], [0.0, 0.0, 0.0], 1.0, "xyz")
    ms = binvox.read_as_coord_array(io.BytesIO(binvox.dumps(m)))
    assert ms.data.shape == (3, 0)


def test_sparse_to_dense_discards_out_of_range():
    coords = np.array([[0, 7, 8, -1], [0, 7, 0, 0], [0, 7, 0, 0]])
    dense = binvox.sparse_to_dense(coords, 8)
    assert dense.sum() == 2  # (0,0,0) and (7,7,7) only
    assert dense[0, 0, 0] and dense[7, 7, 7]


def test_header_metadata_preserved():
    vol = np.zeros((4, 4, 4), dtype=bool)
    vol[1, 2, 3] = True
    m = binvox.Voxels(vol, [4, 4, 4], [0.5, -1.25, 3.0], 2.75, "xyz")
    m2 = binvox.loads(binvox.dumps(m))
    assert m2.translate == [0.5, -1.25, 3.0]
    assert m2.scale == 2.75
    assert m2.data[1, 2, 3]
    assert m2.data.sum() == 1


def test_rejects_non_binvox():
    with pytest.raises(IOError):
        binvox.loads(b"not a binvox file\n")


# ---------------------------------------------------------------------------
# Byte-level interop with the reference codec (/root/reference/utils/
# binvox_rw.py, numpy-only and importable by file path).  Both directions:
# our writer -> reference reader, reference writer -> our reader.


@pytest.fixture(scope="module")
def ref_binvox():
    import importlib.util
    import os

    path = "/root/reference/utils/binvox_rw.py"
    if not os.path.exists(path):
        pytest.skip("reference codec not available")
    spec = importlib.util.spec_from_file_location("ref_binvox", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _interop_volumes(rng):
    return [
        random_volume(rng),
        blob_volume(),
        np.zeros((32, 32, 32), bool),
        np.ones((8, 8, 8), bool),
    ]


def test_ours_to_reference(rng, ref_binvox):
    for vol in _interop_volumes(rng):
        model = binvox.Voxels(
            vol, list(vol.shape), [0.0, 0.0, 0.0], 1.0, "xyz"
        )
        buf = binvox.dumps(model)
        ref = ref_binvox.read_as_3d_array(io.BytesIO(buf))
        np.testing.assert_array_equal(ref.data, vol)
        assert list(ref.dims) == list(vol.shape)
        assert ref.scale == 1.0


def test_reference_to_ours(rng, ref_binvox):
    for vol in _interop_volumes(rng):
        model = ref_binvox.Voxels(
            vol, list(vol.shape), [0.0, 0.0, 0.0], 1.0, "xyz"
        )
        out = io.BytesIO()
        ref_binvox.write(model, out)
        ours = binvox.loads(out.getvalue())
        np.testing.assert_array_equal(ours.data, vol)
        assert list(ours.dims) == list(vol.shape)


def test_byte_identical_to_reference_writer(rng, ref_binvox):
    """Our RLE encoder emits the exact bytes the reference writer does."""
    for vol in _interop_volumes(rng):
        ours = binvox.dumps(
            binvox.Voxels(vol, list(vol.shape), [0.0, 0.0, 0.0], 1.0, "xyz")
        )
        out = io.BytesIO()
        ref_binvox.write(
            ref_binvox.Voxels(vol, list(vol.shape), [0.0, 0.0, 0.0], 1.0, "xyz"),
            out,
        )
        assert ours == out.getvalue()


def test_coord_array_interop(rng, ref_binvox):
    """Same voxel set from read_as_coord_array on both codecs.

    The reference's version (binvox_rw.py:191-194) divides indices with
    py3 true division (`/` where py2 meant `//`), returning float
    coordinates; flooring them recovers the integer voxel coords our
    codec returns directly.
    """
    vol = random_volume(rng)
    buf = binvox.dumps(
        binvox.Voxels(vol, list(vol.shape), [0.0, 0.0, 0.0], 1.0, "xyz")
    )
    ref_coords = ref_binvox.read_as_coord_array(io.BytesIO(buf))
    our_coords = binvox.read_as_coord_array(io.BytesIO(buf))

    def colsorted(a):
        a = np.asarray(a)
        return a[:, np.lexsort(a[::-1])]

    np.testing.assert_array_equal(
        colsorted(np.floor(ref_coords.data).astype(np.int64)),
        colsorted(np.asarray(our_coords.data, np.int64)),
    )
