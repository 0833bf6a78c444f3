"""ctypes binding for the native PNG decode core (csrc/dataio.cpp).

Builds the shared library on first use (g++ -O3, cached next to the
source); every entry point degrades gracefully to PIL when the toolchain
or a given file isn't supported, so the pipeline never hard-depends on the
native path.  Decoding is lossless — pixels are bit-exact with PIL.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_failed = False


def _csrc_dir():
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), 'csrc')


def _build_and_load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        src = os.path.join(_csrc_dir(), 'dataio.cpp')
        so = os.path.join(_csrc_dir(), '_dataio.so')
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ['g++', '-O3', '-shared', '-fPIC', src, '-lz', '-o', so],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            lib.png_dims.restype = ctypes.c_int
            lib.png_dims.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.decode_png_rgb.restype = ctypes.c_int
            lib.decode_png_rgb.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def available():
    return _build_and_load() is not None


def decode_png(path):
    """Decode a PNG file to an (H, W, 3) uint8 array, or None on any
    failure (caller falls back to PIL)."""
    lib = _build_and_load()
    if lib is None:
        return None
    try:
        with open(path, 'rb') as f:
            data = f.read()
    except OSError:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.png_dims(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.decode_png_rgb(data, len(data),
                            out.ctypes.data_as(ctypes.c_char_p))
    if rc != 0:
        return None
    return out
