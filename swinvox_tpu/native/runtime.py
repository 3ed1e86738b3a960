"""ctypes loader for the native codec, building it on demand.

The shared object is compiled once with g++ -O3 into
~/.cache/swinvox_tpu/native/ (or $SWINVOX_NATIVE_DIR) keyed by a source
hash, so editing the .cc transparently rebuilds.  If no compiler is
available the import degrades to None and callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import Optional

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "voxcodec.cc")
_IMG_SRC = os.path.join(os.path.dirname(__file__), "imgcodec.cc")
_CACHE_DIR = os.environ.get(
    "SWINVOX_NATIVE_DIR", os.path.expanduser("~/.cache/swinvox_tpu/native")
)


def _build_so(src: str, name: str, extra_flags=()) -> Optional[str]:
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    so_path = os.path.join(_CACHE_DIR, f"{name}-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_CACHE_DIR, exist_ok=True)
    # Concurrent builders (e.g. pytest-xdist workers) must not share a tmp
    # path: compile to a per-process file, then atomically rename — losing
    # the rename race is fine because the content is identical.
    tmp_path = f"{so_path}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", tmp_path, src, *extra_flags,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp_path, so_path)
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        if os.path.exists(so_path):  # another process won the build race
            return so_path
        log.warning("native %s build failed (%s); using fallback", name, e)
        return None
    log.info("built native %s: %s", name, so_path)
    return so_path


def _build() -> Optional[str]:
    return _build_so(_SRC, "voxcodec")


_lib = None
_tried = False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SWINVOX_DISABLE_NATIVE"):
        return None
    so_path = _build()
    if so_path is None:
        return None
    lib = ctypes.CDLL(so_path)
    lib.voxcodec_decode.restype = ctypes.c_long
    lib.voxcodec_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.voxcodec_encode.restype = ctypes.c_long
    lib.voxcodec_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.voxcodec_transpose_xzy.restype = None
    lib.voxcodec_transpose_xzy.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
    ]
    _lib = lib
    return _lib


# ------------------------------------------------------------ image codec

_img_lib = None
_img_tried = False


def get_img_lib() -> Optional[ctypes.CDLL]:
    """The native PNG/JPEG -> float32 BGR(A) decoder, or None."""
    global _img_lib, _img_tried
    if _img_tried:
        return _img_lib
    _img_tried = True
    if os.environ.get("SWINVOX_DISABLE_NATIVE"):
        return None
    so_path = _build_so(_IMG_SRC, "imgcodec", ("-lpng", "-ljpeg"))
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:  # cached .so whose libpng/libjpeg are missing
        log.warning("native imgcodec load failed (%s); using PIL", e)
        return None
    lib.imgcodec_decode.restype = ctypes.c_long
    lib.imgcodec_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.imgcodec_free.restype = None
    lib.imgcodec_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.imgcodec_resize_bilinear.restype = ctypes.c_long
    lib.imgcodec_resize_bilinear.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
    ]
    _img_lib = lib
    return _img_lib


def decode_image_native(data: bytes):
    """bytes -> float32 [H, W, 3|4] BGR(A) in [0,1], or None on fallback.

    Decode and the uint8->float BGR conversion run in C with the GIL
    released — loader threads scale on real cores.
    """
    import numpy as np

    lib = get_img_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    dims = (ctypes.c_long * 3)()
    rc = lib.imgcodec_decode(data, len(data), ctypes.byref(out), dims)
    if rc != 0:
        return None  # unknown format / corrupt -> caller falls back
    try:
        h, w, c = dims[0], dims[1], dims[2]
        arr = np.ctypeslib.as_array(out, shape=(h, w, c)).copy()
    finally:
        lib.imgcodec_free(out)
    return arr


def resize_bilinear_native(img, out_h: int, out_w: int):
    """float32 [H, W, C] -> [out_h, out_w, C] half-pixel bilinear resize
    in C (GIL released), or None when the native lib is unavailable.
    Same semantics as transforms.resize_bilinear_np."""
    import numpy as np

    lib = get_img_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(img, dtype=np.float32)
    h, w, c = src.shape
    dst = np.empty((out_h, out_w, c), np.float32)
    rc = lib.imgcodec_resize_bilinear(
        src.ctypes.data, h, w, c, dst.ctypes.data, out_h, out_w
    )
    if rc != 0:  # allocation failure — caller falls back to numpy
        return None
    return dst
