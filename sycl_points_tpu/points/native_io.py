"""ctypes binding for the native C++ I/O runtime (native/sycl_points_io.cpp).

Provides fast PLY / KITTI readers and a background-prefetching sequence
loader (host I/O overlapping device compute).  Falls back to the pure-numpy
readers in :mod:`sycl_points_tpu.points.io` when the shared library is not
built; ``ensure_built`` compiles it on demand with the repo Makefile.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsycl_points_io.so"))
_lib = None


class _SptCloud(ctypes.Structure):
    _fields_ = [
        ("points", ctypes.POINTER(ctypes.c_float)),
        ("intensity", ctypes.POINTER(ctypes.c_float)),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("rgb", ctypes.POINTER(ctypes.c_float)),
        ("timestamps", ctypes.POINTER(ctypes.c_float)),
        ("n", ctypes.c_int64),
        ("ok", ctypes.c_int32),
        ("error", ctypes.c_char * 256),
    ]


def ensure_built(quiet: bool = True) -> bool:
    """Build the native library if missing.  Returns availability."""
    global _lib
    if _lib is not None:
        return True
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "sycl_points_io.cpp"))
    stale = (
        not os.path.exists(_LIB_PATH)
        or (os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    )
    if stale:
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), "-B"],
                check=True,
                capture_output=quiet,
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return False
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return False
    lib.spt_read_ply.restype = ctypes.POINTER(_SptCloud)
    lib.spt_read_ply.argtypes = [ctypes.c_char_p]
    lib.spt_read_kitti_bin.restype = ctypes.POINTER(_SptCloud)
    lib.spt_read_kitti_bin.argtypes = [ctypes.c_char_p]
    lib.spt_free_cloud.argtypes = [ctypes.POINTER(_SptCloud)]
    lib.spt_loader_open.restype = ctypes.c_void_p
    lib.spt_loader_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
    ]
    lib.spt_loader_next.restype = ctypes.POINTER(_SptCloud)
    lib.spt_loader_next.argtypes = [ctypes.c_void_p]
    lib.spt_loader_close.argtypes = [ctypes.c_void_p]
    for fn in (lib.spt_lzf_decompress, lib.spt_lzf_compress):
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
    _lib = lib
    return True


def available() -> bool:
    return ensure_built()


def _cloud_to_dict(ptr) -> Dict[str, np.ndarray]:
    c = ptr.contents
    if not c.ok:
        err = bytes(c.error).split(b"\0")[0].decode()
        _lib.spt_free_cloud(ptr)
        raise IOError(f"native reader failed: {err}")
    n = c.n
    out: Dict[str, np.ndarray] = {
        "points": np.ctypeslib.as_array(c.points, shape=(n, 3)).copy()
    }
    if c.intensity:
        out["intensities"] = np.ctypeslib.as_array(c.intensity, shape=(n,)).copy()
    if c.normals:
        out["normals"] = np.ctypeslib.as_array(c.normals, shape=(n, 3)).copy()
    if c.rgb:
        out["rgb"] = np.ctypeslib.as_array(c.rgb, shape=(n, 4)).copy()
    if c.timestamps:
        out["timestamp_offsets"] = np.ctypeslib.as_array(c.timestamps, shape=(n,)).copy()
    _lib.spt_free_cloud(ptr)
    return out


def read_ply(path: str) -> Dict[str, np.ndarray]:
    if not ensure_built():
        from sycl_points_tpu.points import io as _io

        return _io.read_ply(path)
    return _cloud_to_dict(_lib.spt_read_ply(path.encode()))


def read_kitti_bin(path: str) -> Dict[str, np.ndarray]:
    if not ensure_built():
        from sycl_points_tpu.points.conversion import read_kitti_bin as _fallback

        return _fallback(path)
    return _cloud_to_dict(_lib.spt_read_kitti_bin(path.encode()))


class PrefetchLoader:
    """Background-thread sequence loader: scan N+1 parses from disk while the
    consumer processes scan N."""

    def __init__(self, paths: Sequence[str], prefetch: int = 2):
        self.paths = list(paths)
        self._native = ensure_built()
        self._handle = None
        if self._native:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._keepalive = arr
            self._handle = _lib.spt_loader_open(arr, len(self.paths), prefetch)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self._handle:
            for _ in range(len(self.paths)):
                ptr = _lib.spt_loader_next(self._handle)
                if not ptr:
                    break
                yield _cloud_to_dict(ptr)
        else:
            from sycl_points_tpu.points import io as _io
            from sycl_points_tpu.points.conversion import read_kitti_bin as _kitti

            for p in self.paths:
                yield _io.read_file(p) if p.endswith(".ply") else _kitti(p)

    def close(self):
        if self._handle:
            _lib.spt_loader_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# -- liblzf codec (PCL binary_compressed PCD payloads) -------------------------

def _as_u8_ptr(buf):
    return ctypes.cast(
        (ctypes.c_uint8 * len(buf)).from_buffer_copy(buf),
        ctypes.POINTER(ctypes.c_uint8),
    )


def lzf_decompress(src: bytes, out_len: int) -> Optional[bytes]:
    """Native LZF decode; None when the library is unavailable.
    Raises ValueError on a corrupt stream (same contract as the pure-Python
    fallback in points/io.py)."""
    if not ensure_built():
        return None
    out = (ctypes.c_uint8 * out_len)()
    got = _lib.spt_lzf_decompress(
        _as_u8_ptr(src), len(src),
        ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)), out_len,
    )
    if got != out_len:
        raise ValueError(
            f"lzf: decompressed {got} bytes, expected {out_len}"
        )
    return bytes(out)


def lzf_compress(src: bytes) -> Optional[bytes]:
    """Native LZF encode; None when the library is unavailable."""
    if not ensure_built():
        return None
    # worst case: all literals = n + ceil(n/32) control bytes
    cap = len(src) + len(src) // 32 + 64
    out = (ctypes.c_uint8 * cap)()
    got = _lib.spt_lzf_compress(
        _as_u8_ptr(src), len(src),
        ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if got < 0:
        raise ValueError("lzf: compression output exceeded worst-case bound")
    return bytes(out[:got])
