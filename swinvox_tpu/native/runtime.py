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
_CACHE_DIR = os.environ.get(
    "SWINVOX_NATIVE_DIR", os.path.expanduser("~/.cache/swinvox_tpu/native")
)


def _build() -> Optional[str]:
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    so_path = os.path.join(_CACHE_DIR, f"voxcodec-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_CACHE_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", so_path + ".tmp", _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.warning("native codec build failed (%s); using numpy fallback", e)
        return None
    os.replace(so_path + ".tmp", so_path)
    log.info("built native codec: %s", so_path)
    return so_path


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
