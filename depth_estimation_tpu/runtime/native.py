"""ctypes bindings for the C++ framepipe runtime (native/framepipe.cpp).

``NativeSource``/``NativeSink`` drop into the FrameSource/FrameSink slots of
the streaming runtime: decode runs in a C++ thread into a pre-allocated
zero-copy ring, encode in a C++ thread draining a bounded queue — neither
holds the GIL, so host IO genuinely overlaps TPU compute.

The library auto-builds on first use (``make -C native``); everything
degrades gracefully to the pure-Python sources when the toolchain or
OpenCV headers are missing (``native_available()``).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional, Tuple

import numpy as np

from depth_estimation_tpu.runtime.video import FrameSink, FrameSource

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libframepipe.so"
_lib = None
_load_error: Optional[str] = None


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True, timeout=300
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.fp_open_video.restype = ctypes.c_void_p
        lib.fp_open_video.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.fp_open_synthetic.restype = ctypes.c_void_p
        lib.fp_open_synthetic.argtypes = [ctypes.c_int] * 4
        lib.fp_width.restype = ctypes.c_int
        lib.fp_width.argtypes = [ctypes.c_void_p]
        lib.fp_height.restype = ctypes.c_int
        lib.fp_height.argtypes = [ctypes.c_void_p]
        lib.fp_frame_count.restype = ctypes.c_double
        lib.fp_frame_count.argtypes = [ctypes.c_void_p]
        lib.fp_acquire.restype = ctypes.c_int
        lib.fp_acquire.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
        lib.fp_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fp_close.argtypes = [ctypes.c_void_p]
        lib.fw_open.restype = ctypes.c_void_p
        lib.fw_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_char_p]
        lib.fw_write.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte)]
        lib.fw_written.restype = ctypes.c_long
        lib.fw_written.argtypes = [ctypes.c_void_p]
        lib.fw_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # missing toolchain/OpenCV — fall back to Python IO
        _load_error = f"{type(e).__name__}: {e}"
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def native_load_error() -> Optional[str]:
    _load()
    return _load_error


class NativeSource(FrameSource):
    """C++ decode thread + zero-copy ring. src: path or 'synthetic:NxHxW'."""

    def __init__(self, src: str, ring_depth: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native framepipe unavailable: {_load_error}")
        self._lib = lib
        if isinstance(src, str) and src.startswith("synthetic:"):
            n, h, w = (int(v) for v in src.split(":", 1)[1].split("x"))
            self._h = lib.fp_open_synthetic(n, h, w, ring_depth)
        else:
            self._h = lib.fp_open_video(str(src).encode(), ring_depth)
        if not self._h:
            self._h = None
            self.width = self.height = 0
            self.frame_count = -1.0
            return
        self.width = lib.fp_width(self._h)
        self.height = lib.fp_height(self._h)
        self.frame_count = lib.fp_frame_count(self._h)

    def read(self) -> Tuple[bool, Optional[np.ndarray]]:
        if self._h is None:
            return False, None
        ptr = ctypes.POINTER(ctypes.c_ubyte)()
        slot = self._lib.fp_acquire(self._h, ctypes.byref(ptr))
        if slot < 0:
            return False, None
        # copy out of the ring so the slot can be recycled immediately;
        # the copy is a fast memcpy and the decode already happened off-GIL
        buf = np.ctypeslib.as_array(ptr, shape=(self.height, self.width, 3))
        frame = buf.copy()
        self._lib.fp_release(self._h, slot)
        return True, frame

    def read_borrowed(self):
        """Zero-copy variant: returns (slot, view). Caller must release(slot)
        before the next read; the view is invalidated afterwards."""
        ptr = ctypes.POINTER(ctypes.c_ubyte)()
        slot = self._lib.fp_acquire(self._h, ctypes.byref(ptr))
        if slot < 0:
            return -1, None
        view = np.ctypeslib.as_array(ptr, shape=(self.height, self.width, 3))
        return slot, view

    def release_slot(self, slot: int) -> None:
        self._lib.fp_release(self._h, slot)

    def is_opened(self) -> bool:
        return self._h is not None

    def release(self) -> None:
        if self._h is not None:
            self._lib.fp_close(self._h)
            self._h = None


class NativeSink(FrameSink):
    """C++ async MJPG writer."""

    def __init__(self, path, size_wh: Tuple[int, int], fps: float = 20.0, fourcc: str = "MJPG"):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native framepipe unavailable: {_load_error}")
        self._lib = lib
        self._w, self._h2 = int(size_wh[0]), int(size_wh[1])
        self._h = lib.fw_open(str(path).encode(), self._w, self._h2, float(fps), fourcc.encode())
        if not self._h:
            raise RuntimeError(f"could not open writer {path}")

    def write(self, frame: np.ndarray) -> None:
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        assert frame.shape == (self._h2, self._w, 3), (frame.shape, (self._h2, self._w, 3))
        self._lib.fw_write(self._h, frame.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))

    def frames_written(self) -> int:
        return int(self._lib.fw_written(self._h))

    def release(self) -> None:
        if self._h is not None:
            self._lib.fw_close(self._h)
            self._h = None
