"""ctypes bindings for the native C++ data-loader runtime.

The reference's data path is native C++ (ROS rosbag playback feeding the
plane-SLAM node, SURVEY.md §3.2's "ROS IPC boundary"); this framework's
equivalent lives in ``native/``: a libpng codec + threaded prefetch
scheduler that decodes TUM frames ahead of the SLAM loop on worker
threads, so host-side decode overlaps the TPU step without the GIL in
the way.  Python talks to it through this ctypes layer (no pybind11 on
this image).

The shared library is built on demand (``make -C native``); callers
that can live without it (unit tests on machines without a toolchain)
should check :func:`available` and fall back to the pure-Python loader
in :mod:`pop_up_slam_tpu.io.tum`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpopup_native.so")
_ERR_LEN = 512

_lib = None
_load_error: str | None = None


def _build_and_load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                text=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception as e:  # toolchain or load failure -> fallback mode
        _load_error = f"{type(e).__name__}: {e}"
        return

    c_char_p = ctypes.c_char_p
    c_void_p = ctypes.c_void_p
    c_int = ctypes.c_int
    c_long = ctypes.c_long
    c_double = ctypes.c_double
    ip = ctypes.POINTER(c_int)
    dp = ctypes.POINTER(c_double)

    lib.popup_png_decode.restype = c_int
    lib.popup_png_decode.argtypes = [
        c_char_p, c_void_p, c_long, ip, ip, ip, ip, c_char_p, c_int,
    ]
    lib.popup_png_encode.restype = c_int
    lib.popup_png_encode.argtypes = [
        c_char_p, c_void_p, c_int, c_int, c_int, c_int, c_char_p, c_int,
    ]
    lib.popup_seq_open.restype = c_void_p
    lib.popup_seq_open.argtypes = [c_char_p, c_char_p, c_int]
    lib.popup_seq_close.restype = None
    lib.popup_seq_close.argtypes = [c_void_p]
    for name in ("popup_seq_num_rgb", "popup_seq_num_depth",
                 "popup_seq_num_gt", "popup_seq_has_seg"):
        fn = getattr(lib, name)
        fn.restype = c_int
        fn.argtypes = [c_void_p]
    lib.popup_seq_stamps.restype = c_int
    lib.popup_seq_stamps.argtypes = [c_void_p, c_int, dp, c_int]
    lib.popup_seq_gt.restype = c_int
    lib.popup_seq_gt.argtypes = [c_void_p, dp, c_int]
    lib.popup_seq_rgb_path.restype = c_int
    lib.popup_seq_rgb_path.argtypes = [c_void_p, c_int, c_char_p, c_int]
    lib.popup_associate.restype = c_int
    lib.popup_associate.argtypes = [dp, c_int, dp, c_int, c_double, ip, c_int]
    lib.popup_prefetch_start.restype = c_int
    lib.popup_prefetch_start.argtypes = [
        c_void_p, ip, c_int, c_int, c_int, c_char_p, c_int,
    ]
    lib.popup_prefetch_next_info.restype = c_int
    lib.popup_prefetch_next_info.argtypes = [
        c_void_p, ip, ip, ip, ip, dp, c_char_p, c_int,
    ]
    lib.popup_prefetch_next_copy.restype = c_int
    lib.popup_prefetch_next_copy.argtypes = [
        c_void_p, c_void_p, c_long, c_char_p, c_int,
    ]
    lib.popup_prefetch_stop.restype = None
    lib.popup_prefetch_stop.argtypes = [c_void_p]
    _lib = lib


def available() -> bool:
    """True when the native library is built and loadable."""
    _build_and_load()
    return _lib is not None


def load_error() -> str | None:
    _build_and_load()
    return _load_error


def _err_buf():
    return ctypes.create_string_buffer(_ERR_LEN)


def _raise(err) -> None:
    raise RuntimeError(err.value.decode() or "native loader error")


def decode_png(path: str) -> np.ndarray:
    """Decode a PNG via the native codec.

    Returns (H, W) or (H, W, C) uint8, or (H, W) uint16 for 16-bit
    grayscale (TUM depth).
    """
    _build_and_load()
    if _lib is None:
        raise RuntimeError(f"native loader unavailable: {_load_error}")
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    err = _err_buf()
    p = path.encode()
    if _lib.popup_png_decode(p, None, 0, ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(c), ctypes.byref(bd), err,
                             _ERR_LEN) != 0:
        _raise(err)
    dtype = np.uint16 if bd.value == 16 else np.uint8
    buf = np.empty((h.value, w.value, c.value), dtype)
    if _lib.popup_png_decode(
        p, buf.ctypes.data_as(ctypes.c_void_p), buf.nbytes,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
        ctypes.byref(bd), err, _ERR_LEN,
    ) != 0:
        _raise(err)
    return buf[..., 0] if c.value == 1 else buf


def encode_png(path: str, img: np.ndarray) -> None:
    """Encode uint8 gray/RGB or uint16 gray to PNG via the native codec."""
    _build_and_load()
    if _lib is None:
        raise RuntimeError(f"native loader unavailable: {_load_error}")
    img = np.ascontiguousarray(img)
    if img.dtype == np.uint16:
        bd, channels = 16, 1
        assert img.ndim == 2, "16-bit encode is grayscale only"
    elif img.dtype == np.uint8:
        bd = 8
        channels = 1 if img.ndim == 2 else img.shape[2]
        assert channels in (1, 3), "encode supports gray/RGB"
    else:
        raise ValueError(f"unsupported dtype {img.dtype}")
    err = _err_buf()
    if _lib.popup_png_encode(
        path.encode(), img.ctypes.data_as(ctypes.c_void_p),
        img.shape[1], img.shape[0], channels, bd, err, _ERR_LEN,
    ) != 0:
        _raise(err)


def associate(stamps_a, stamps_b, max_difference: float = 0.02):
    """Native greedy nearest-stamp association (same contract as
    ``evaluation.ate.associate``)."""
    _build_and_load()
    if _lib is None:
        raise RuntimeError(f"native loader unavailable: {_load_error}")
    a = np.ascontiguousarray(stamps_a, np.float64)
    b = np.ascontiguousarray(stamps_b, np.float64)
    cap = min(len(a), len(b))
    out = np.empty((max(cap, 1), 2), np.int32)
    n = _lib.popup_associate(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(b),
        max_difference,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), cap,
    )
    return [(int(i), int(j)) for i, j in out[: min(n, cap)]]


class NativeSequence:
    """A TUM sequence opened through the native loader, with an optional
    threaded prefetch stream over (a subset of) the rgb frames."""

    def __init__(self, root: str):
        _build_and_load()
        if _lib is None:
            raise RuntimeError(f"native loader unavailable: {_load_error}")
        err = _err_buf()
        self._h = _lib.popup_seq_open(root.encode(), err, _ERR_LEN)
        if not self._h:
            _raise(err)
        self.root = root

    def close(self) -> None:
        if getattr(self, "_h", None):
            _lib.popup_seq_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- metadata ------------------------------------------------------
    @property
    def num_rgb(self) -> int:
        return _lib.popup_seq_num_rgb(self._h)

    @property
    def num_gt(self) -> int:
        return _lib.popup_seq_num_gt(self._h)

    def stamps(self, kind: str = "rgb") -> np.ndarray:
        k = {"rgb": 0, "depth": 1, "gt": 2}[kind]
        n = {"rgb": self.num_rgb, "depth":
             _lib.popup_seq_num_depth(self._h), "gt": self.num_gt}[kind]
        out = np.empty((max(n, 1),), np.float64)
        got = _lib.popup_seq_stamps(
            self._h, k, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n
        )
        return out[:got]

    def gt_poses(self) -> np.ndarray:
        """(N, 7) float64 rows [tx ty tz qx qy qz qw]."""
        n = self.num_gt
        out = np.empty((max(n, 1), 7), np.float64)
        got = _lib.popup_seq_gt(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n
        )
        return out[:got]

    def rgb_path(self, i: int) -> str:
        buf = ctypes.create_string_buffer(4096)
        if _lib.popup_seq_rgb_path(self._h, i, buf, 4096) != 0:
            raise IndexError(i)
        return buf.value.decode()

    # -- prefetch stream -----------------------------------------------
    def stream(self, indices=None, num_threads: int = 2,
               lookahead: int = 8) -> Iterator[tuple[float, np.ndarray]]:
        """Yield (stamp, image) in order while worker threads decode
        ahead.  ``indices`` restricts/reorders to a frame subset."""
        err = _err_buf()
        if indices is not None:
            idx = np.ascontiguousarray(indices, np.int32)
            ptr = idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
            n_idx = len(idx)
        else:
            ptr, n_idx = None, 0
        if _lib.popup_prefetch_start(self._h, ptr, n_idx, num_threads,
                                     lookahead, err, _ERR_LEN) != 0:
            _raise(err)
        try:
            w = ctypes.c_int()
            h = ctypes.c_int()
            c = ctypes.c_int()
            bd = ctypes.c_int()
            stamp = ctypes.c_double()
            while True:
                rc = _lib.popup_prefetch_next_info(
                    self._h, ctypes.byref(w), ctypes.byref(h),
                    ctypes.byref(c), ctypes.byref(bd),
                    ctypes.byref(stamp), err, _ERR_LEN,
                )
                if rc == 0:
                    return
                if rc < 0:
                    _raise(err)
                dtype = np.uint16 if bd.value == 16 else np.uint8
                buf = np.empty((h.value, w.value, c.value), dtype)
                if _lib.popup_prefetch_next_copy(
                    self._h, buf.ctypes.data_as(ctypes.c_void_p),
                    buf.nbytes, err, _ERR_LEN,
                ) != 0:
                    _raise(err)
                img = buf[..., 0] if c.value == 1 else buf
                yield float(stamp.value), img
        finally:
            _lib.popup_prefetch_stop(self._h)
