"""Native C++ codec: build, parity with numpy paths, and fallback."""

import io
import os

import numpy as np
import pytest

from swinvox_tpu.data import binvox
from swinvox_tpu.native import get_lib


def test_native_library_builds():
    lib = get_lib()
    if lib is None:
        pytest.skip("no compiler available")
    assert hasattr(lib, "voxcodec_decode")


def test_native_decode_encode_parity(rng):
    lib = get_lib()
    if lib is None:
        pytest.skip("no compiler available")
    vol = (rng.random((32, 32, 32)) < 0.25).astype(bool)
    m = binvox.Voxels(vol, [32, 32, 32], [0.0, 0.0, 0.0], 1.0, "xyz")
    buf = binvox.dumps(m)  # encode (native path)

    # decode through the public reader (native path) and pure numpy path
    decoded = binvox.loads(buf)
    assert np.array_equal(decoded.data, vol)

    os.environ["SWINVOX_DISABLE_NATIVE"] = "1"
    try:
        import swinvox_tpu.native.runtime as rt

        rt._tried, rt._lib = False, None  # force re-evaluation
        decoded_np = binvox.loads(buf)
        buf_np = binvox.dumps(m)
    finally:
        del os.environ["SWINVOX_DISABLE_NATIVE"]
        rt._tried, rt._lib = False, None
    assert np.array_equal(decoded_np.data, vol)
    assert buf_np == buf  # identical byte streams from both encoders


def test_native_rejects_overflow(rng):
    lib = get_lib()
    if lib is None:
        pytest.skip("no compiler available")
    vol = np.zeros((8, 8, 8), bool)
    m = binvox.Voxels(vol, [8, 8, 8], [0.0, 0.0, 0.0], 1.0, "xyz")
    buf = binvox.dumps(m)
    head, payload = buf.split(b"data\n", 1)
    # claim smaller dims than the payload encodes -> decode must fail
    bad = head.replace(b"dim 8 8 8", b"dim 4 4 4") + b"data\n" + payload
    with pytest.raises(IOError):
        binvox.loads(bad)
