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


# ------------------------------------------------------------ image codec


def _pil_bgr(data):
    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        if im.mode == "P":
            im = im.convert("RGBA" if "transparency" in im.info else "RGB")
        elif im.mode == "LA":
            im = im.convert("RGBA")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    arr = arr.astype(np.float32) / 255.0
    return arr[..., [2, 1, 0, 3]] if arr.shape[-1] == 4 else arr[..., ::-1]


@pytest.mark.parametrize(
    "mode,fmt", [("RGB", "PNG"), ("RGBA", "PNG"), ("L", "PNG"),
                 ("LA", "PNG"), ("RGB", "JPEG"), ("L", "JPEG")]
)
def test_native_image_decode_matches_pil(rng, mode, fmt):
    """Native PNG/JPEG decode == the PIL reference path (both produce
    cv2.imread(UNCHANGED)/255 BGR(A) semantics)."""
    from PIL import Image

    from swinvox_tpu.native.runtime import decode_image_native

    shape = {"RGB": (37, 53, 3), "RGBA": (37, 53, 4), "L": (37, 53),
             "LA": (37, 53, 2)}[mode]
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(buf, fmt)
    data = buf.getvalue()
    nat = decode_image_native(data)
    if nat is None:
        pytest.skip("native image codec unavailable")
    ref = _pil_bgr(data)
    assert nat.shape == ref.shape
    tol = 3 / 255 if fmt == "JPEG" else 1e-6  # IDCT may differ slightly
    np.testing.assert_allclose(nat, ref, atol=tol)


def test_native_image_decode_unknown_format_falls_back():
    from swinvox_tpu.native.runtime import decode_image_native

    assert decode_image_native(b"\x00\x01\x02\x03not-an-image") is None


def test_load_image_bgr_uses_native_and_fallback(rng, tmp_path):
    """load_image_bgr: identical output with and without the native codec."""
    import os

    from PIL import Image

    import swinvox_tpu.native.runtime as rt
    from swinvox_tpu.data.pipeline import load_image_bgr

    arr = rng.integers(0, 256, (24, 31, 4), dtype=np.uint8)
    path = str(tmp_path / "x.png")
    Image.fromarray(arr, "RGBA").save(path, "PNG")
    native = load_image_bgr(path)
    os.environ["SWINVOX_DISABLE_NATIVE"] = "1"
    rt._img_tried, rt._img_lib = False, None
    try:
        fallback = load_image_bgr(path)
    finally:
        del os.environ["SWINVOX_DISABLE_NATIVE"]
        rt._img_tried, rt._img_lib = False, None
    # C multiplies by 1/255.f, numpy divides by 255.0 — 1 ulp apart
    np.testing.assert_allclose(native, fallback, atol=1e-6)
    assert native.shape == (24, 31, 4)


def test_native_resize_matches_numpy(rng):
    """imgcodec_resize_bilinear == the numpy half-pixel bilinear resize
    (f32 rounding-order tolerance only)."""
    import swinvox_tpu.native.runtime as rt
    from swinvox_tpu.data import transforms as tr

    for shape, (oh, ow) in [
        ((137, 137, 4), (224, 224)),
        ((128, 128, 3), (224, 224)),
        ((224, 224, 3), (112, 160)),
        ((7, 9, 3), (30, 14)),
    ]:
        img = rng.random(shape).astype(np.float32)
        native = rt.resize_bilinear_native(img, oh, ow)
        if native is None:
            import pytest

            pytest.skip("native imgcodec unavailable")
        orig = rt.resize_bilinear_native
        rt.resize_bilinear_native = lambda *a: None
        try:
            ref = tr.resize_bilinear_np(img, oh, ow)
        finally:
            rt.resize_bilinear_native = orig
        assert native.shape == ref.shape
        np.testing.assert_allclose(native, ref, atol=1e-4)
