"""Native (C++) runtime components, loaded via ctypes with numpy fallback."""

from swinvox_tpu.native.runtime import get_lib  # noqa: F401
