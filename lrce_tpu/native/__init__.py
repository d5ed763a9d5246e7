"""ctypes bindings for the native C++ host runtime.

Builds liblrce_native.so on first use (g++ via the Makefile) and exposes:
  - NativeWordPiece: ASCII fast-path tokenizer (falls back to Python for
    non-ASCII inputs),
  - gif_probe / gif_decode: self-contained GIF decoder,
  - resize_bilinear: PIL-exact antialiased bilinear resize.

Everything degrades gracefully: if the toolchain or the build is missing,
`load_native()` returns None and callers use the Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "liblrce_native.so")
_lock = threading.Lock()
_lib = None
_build_attempted = False


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _build_attempted
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        lib.wp_load.restype = ctypes.c_void_p
        lib.wp_load.argtypes = [ctypes.c_char_p]
        lib.wp_free.argtypes = [ctypes.c_void_p]
        lib.wp_encode.restype = ctypes.c_int
        lib.wp_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long)]
        lib.gif_probe.restype = ctypes.c_int
        lib.gif_probe.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
        lib.gif_decode.restype = ctypes.c_int
        lib.gif_decode.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_ubyte),
                                   ctypes.c_int]
        lib.resize_bilinear_u8.restype = ctypes.c_int
        lib.resize_bilinear_u8.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
            ctypes.c_int]
        _lib = lib
        return _lib


class NativeWordPiece:
    """C++ WordPiece handle over a vocab.txt; ASCII-only fast path."""

    def __init__(self, vocab_path: str):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._handle = lib.wp_load(vocab_path.encode())
        if not self._handle:
            raise RuntimeError(f"failed to load vocab {vocab_path}")

    def encode(self, text: str, text_pair: Optional[str] = None,
               max_length: Optional[int] = None,
               truncation: bool = False):
        """Returns (ids, mask, types) int64 arrays or None when the input
        needs the Python Unicode path."""
        cap = max(256, (max_length or 0) + 8)
        ids = np.zeros(cap, np.int64)
        mask = np.zeros(cap, np.int64)
        types = np.zeros(cap, np.int64)
        n = self._lib.wp_encode(
            self._handle, text.encode(),
            text_pair.encode() if text_pair is not None else None,
            max_length or 0, int(truncation),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            types.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
        if n < 0:
            return None
        return ids[:n], mask[:n], types[:n]

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.wp_free(self._handle)
        except Exception:
            pass


def gif_probe(path: str) -> Tuple[int, int, int]:
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    n = ctypes.c_int()
    rc = lib.gif_probe(path.encode(), ctypes.byref(w), ctypes.byref(h),
                       ctypes.byref(n))
    if rc < 0:
        raise IOError(f"gif_probe({path}) failed: {rc}")
    return w.value, h.value, n.value


def gif_decode(path: str, max_frames: Optional[int] = None) -> np.ndarray:
    """Decode all (or first max_frames) frames -> (N, H, W, 3) uint8."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    w, h, n = gif_probe(path)
    if max_frames is not None:
        n = min(n, max_frames)
    out = np.empty((n, h, w, 3), np.uint8)
    rc = lib.gif_decode(path.encode(),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n)
    if rc < 0:
        raise IOError(f"gif_decode({path}) failed: {rc}")
    return out[:rc]


def resize_bilinear(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """PIL-exact bilinear resize of (H, W, C) uint8 to size=(H', W')."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((size[0], size[1], c), np.uint8)
    rc = lib.resize_bilinear_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), size[0], size[1])
    if rc != 0:
        raise RuntimeError("resize_bilinear_u8 failed")
    return out


def native_available() -> bool:
    return load_native() is not None


# ---------------------------------------------------------------------------
# Video decode (liblrce_video.so, linked against the system libav*/ffmpeg).
# Separate shared object: a host without libavformat keeps the rest of the
# native runtime and falls back to cv2 for .avi/.mp4.
# ---------------------------------------------------------------------------

_VIDEO_LIB_PATH = os.path.join(_DIR, "liblrce_video.so")
_video_lib = None
_video_build_attempted = False


def load_native_video() -> Optional[ctypes.CDLL]:
    global _video_lib, _video_build_attempted
    with _lock:
        if _video_lib is not None:
            return _video_lib
        if not os.path.exists(_VIDEO_LIB_PATH) and not _video_build_attempted:
            _video_build_attempted = True
            try:
                subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        if not os.path.exists(_VIDEO_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_VIDEO_LIB_PATH)
        except OSError:
            return None
        lib.video_probe.restype = ctypes.c_int
        lib.video_probe.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int)]
        lib.video_decode_sampled.restype = ctypes.c_int
        lib.video_decode_sampled.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int]
        _video_lib = lib
        return _video_lib


def video_available() -> bool:
    return load_native_video() is not None


def video_probe(path: str) -> Tuple[int, int, int]:
    """Decodable frame count + native dims -> (n_frames, width, height)."""
    lib = load_native_video()
    if lib is None:
        raise RuntimeError("native video library unavailable")
    n = ctypes.c_int()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.video_probe(path.encode(), ctypes.byref(n), ctypes.byref(w),
                         ctypes.byref(h))
    if rc != 0:
        raise IOError(f"video_probe({path}) failed: {rc}")
    return n.value, w.value, h.value


def video_decode_sampled(path: str, indices: np.ndarray,
                         size: Tuple[int, int]) -> np.ndarray:
    """Decode the (sorted unique, ascending) frame `indices` and resize each
    to size=(H', W') -> (len(indices), H', W', 3) uint8. Byte-exact with
    cv2's ffmpeg backend (same libavcodec decode)."""
    lib = load_native_video()
    if lib is None:
        raise RuntimeError("native video library unavailable")
    idx = np.ascontiguousarray(indices, np.int32)
    out = np.empty((len(idx), size[0], size[1], 3), np.uint8)
    rc = lib.video_decode_sampled(
        path.encode(), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(idx), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        size[0], size[1])
    if rc != 0:
        raise IOError(f"video_decode_sampled({path}): {rc} wanted frames "
                      "unreadable" if rc > 0 else
                      f"video_decode_sampled({path}) failed: {rc}")
    return out
