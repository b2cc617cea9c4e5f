"""ctypes bindings for the native scene-loader core.

Falls back silently when the shared library hasn't been built
(``make -C dmcf_tpu/native``); ``Dataset`` uses it automatically for
``*.msgpack.zst`` files when available, giving GIL-free scene decoding in
the prefetcher threads.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_ARRAY_KEYS = ("pos", "vel", "box", "box_normals", "grav", "m", "viscosity")


def _load_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "native",
                        "libscene_loader.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.scene_open.argtypes = [ctypes.c_char_p]
    lib.scene_open.restype = ctypes.c_int64
    lib.scene_num_frames.argtypes = [ctypes.c_int64]
    lib.scene_num_frames.restype = ctypes.c_int64
    lib.scene_get_array.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p]
    lib.scene_get_array.restype = ctypes.c_int
    lib.scene_get_int.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int64)]
    lib.scene_get_int.restype = ctypes.c_int
    lib.scene_has_key.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_char_p]
    lib.scene_has_key.restype = ctypes.c_int
    lib.scene_close.argtypes = [ctypes.c_int64]
    lib.scene_close.restype = None
    _LIB = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


def load_scene(path):
    """Decode a .msgpack.zst scene natively -> list of frame dicts (arrays
    copied out of the handle before close)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native loader not built")
    h = lib.scene_open(path.encode())
    if h <= 0:
        raise RuntimeError(f"scene_open failed ({h}) for {path}")
    try:
        n = lib.scene_num_frames(h)
        frames = []
        for t in range(n):
            frame = {}
            for key in _ARRAY_KEYS:
                if not lib.scene_has_key(h, t, key.encode()):
                    continue
                data = ctypes.c_void_p()
                nbytes = ctypes.c_int64()
                shape = (ctypes.c_int64 * 8)()
                ndim = ctypes.c_int()
                dtype = ctypes.create_string_buffer(16)
                rc = lib.scene_get_array(h, t, key.encode(),
                                         ctypes.byref(data),
                                         ctypes.byref(nbytes), shape,
                                         ctypes.byref(ndim), dtype)
                if rc != 0:
                    # scalar / non-array entry (e.g. canyon 'grav' scalar)
                    val = ctypes.c_int64()
                    if lib.scene_get_int(h, t, key.encode(),
                                         ctypes.byref(val)) == 0:
                        frame[key] = np.int64(val.value)
                    continue
                dt = np.dtype(dtype.value.decode())
                buf = ctypes.string_at(data.value, nbytes.value)
                arr = np.frombuffer(buf, dtype=dt)
                shp = tuple(shape[i] for i in range(ndim.value))
                frame[key] = arr.reshape(shp).copy()
            fid = ctypes.c_int64()
            if lib.scene_get_int(h, t, b"frame_id",
                                 ctypes.byref(fid)) == 0:
                frame["frame_id"] = int(fid.value)
            else:
                frame["frame_id"] = t
            frames.append(frame)
        return frames
    finally:
        lib.scene_close(h)
