"""Native (C++) runtime components, loaded via ctypes.

Built on demand with g++ (no pip/pybind11 in the deployment image); the compiled
shared object is cached next to the source and rebuilt when the source is newer.
Falls back cleanly: callers must treat `load_render()` returning None as "use the
pure-python path".
"""

import ctypes
import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "render.cpp"), os.path.join(_DIR, "recorder.cpp")]
_SO = os.path.join(_DIR, "librender.so")

_render_lib = None
_render_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        *_SRCS, "-o", _SO, "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"[yasph2d_tpu.native] render build failed: {msg}", file=sys.stderr)
        return False


def load_render():
    """Load (building if needed) the native render library, or None."""
    global _render_lib, _render_failed
    if _render_lib is not None:
        return _render_lib
    if _render_failed:
        return None

    stale = not os.path.exists(_SO) or any(
        os.path.getmtime(_SO) < os.path.getmtime(src) for src in _SRCS
    )
    if stale and not _build():
        _render_failed = True
        return None

    lib = ctypes.CDLL(_SO)
    lib.yasph_rasterize.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,  # positions, velocities, n
        ctypes.c_void_p, ctypes.c_int64,  # boundary, nb
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,  # image, w, h
        ctypes.c_float, ctypes.c_float, ctypes.c_float,  # cam_x, cam_y, scale
        ctypes.c_float,  # radius_px
        ctypes.c_float, ctypes.c_float, ctypes.c_float,  # background rgb
    ]
    lib.yasph_rasterize.restype = None
    lib.yasph_write_png.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32
    ]
    lib.yasph_write_png.restype = ctypes.c_int32
    lib.yasph_recorder_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.yasph_recorder_create.restype = ctypes.c_void_p
    lib.yasph_recorder_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p
    ]
    lib.yasph_recorder_submit.restype = ctypes.c_int32
    lib.yasph_recorder_flush.argtypes = [ctypes.c_void_p]
    lib.yasph_recorder_flush.restype = ctypes.c_int32
    lib.yasph_recorder_destroy.argtypes = [ctypes.c_void_p]
    lib.yasph_recorder_destroy.restype = ctypes.c_int32
    _render_lib = lib
    return lib
