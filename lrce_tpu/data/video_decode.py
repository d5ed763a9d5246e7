"""Host-side video decode + frame preprocessing.

The reference decodes EVERY frame of EVERY video with OpenCV on EVERY epoch
and preprocesses all of them (reference lrce/dataset/e2e_dataset.py:76-92) —
that path would starve a TPU. This module keeps the *sampling math and pixel
values identical* while doing strictly less work:

  - frames are counted first (cv2 property or a cheap grab() pass), clip
    indices computed up front, and only sampled frames are converted/resized;
  - resize matches torchvision `Resize((H,W))` on PIL images (PIL bilinear
    with antialias) so pixel values equal the reference's preprocessing
    (e2e_dataset.py:60-62);
  - an optional LRU clip cache skips decode entirely from epoch 2 on;
  - a native C++ GIF decoder (lrce_tpu/native) is used when available.

Output frames are channels-last float32 in [0, 1] — ImageNet normalization
happens on-device inside the jitted model (models/e2e.py).
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from typing import Optional, Sequence, Tuple

import numpy as np

from lrce_tpu.data.sampling import clip_indices


def _pil_resize(frame_rgb: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """PIL bilinear resize (torchvision Resize parity). size = (H, W)."""
    from PIL import Image

    img = Image.fromarray(frame_rgb).convert("RGB")
    img = img.resize((size[1], size[0]), Image.BILINEAR)
    return np.asarray(img, np.uint8)


#: Decodable frame counts are immutable for the lifetime of a run, but the
#: reference re-counts by decoding the full stream on EVERY sample fetch
#: (e2e_dataset.py:81-84). Caching the count halves decode work for every
#: revisit of a video (datasets average ~10-25 questions per video), at a
#: few bytes per entry.
_FRAME_COUNT_CACHE: dict = {}
_FRAME_COUNT_LOCK = threading.Lock()

#: Videos whose native decode failed once: pinned to the cv2 path so their
#: cached (cv2) frame count and decode backend stay consistent on revisits.
_FORCE_CV2_PATHS: set = set()


def count_frames_cached(path: str) -> int:
    with _FRAME_COUNT_LOCK:
        n = _FRAME_COUNT_CACHE.get(path)
    if n is None:
        n = count_frames(path, force_cv2=path in _FORCE_CV2_PATHS)
        with _FRAME_COUNT_LOCK:
            _FRAME_COUNT_CACHE[path] = n
    return n


def invalidate_frame_count(path: str) -> None:
    """Drop a cached count (used when the native probe turns out to
    disagree with what is actually decodable and cv2 must recount)."""
    with _FRAME_COUNT_LOCK:
        _FRAME_COUNT_CACHE.pop(path, None)


def _native_video() :
    """The libav*-backed decoder module, or None (missing lib / disabled)."""
    if os.environ.get("LRCE_TPU_DISABLE_NATIVE"):
        return None
    try:
        from lrce_tpu import native
        if native.video_available():
            return native
    except Exception:
        pass
    return None


def count_frames(path: str, trust_metadata: bool = False,
                 force_cv2: bool = False) -> int:
    """Decodable frame count.

    Defaults to a grab() sweep (no color-convert/resize) because container
    metadata often disagrees with the actually-decodable frame count for
    GIFs/AVIs — and the sampling indices must match the reference, which
    counts by decoding (e2e_dataset.py:81-84). .avi/.mp4 go through the
    native libav* sweep when available (GIL-free, no per-frame Python);
    force_cv2 pins the cv2 grab() count (used after a native-decode
    failure, where the native packet count cannot be trusted).
    """
    if not force_cv2 and not trust_metadata and not path.lower().endswith(".gif"):
        nat = _native_video()
        if nat is not None:
            try:
                n, _, _ = nat.video_probe(path)
                return n
            except IOError:
                pass  # unreadable by libav -> let cv2 try
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"Error in reading video {path}")
    if trust_metadata:
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if n > 0:
            cap.release()
            return n
    n = 0
    while cap.grab():
        n += 1
    cap.release()
    return n


def decode_sampled_frames(path: str, indices: np.ndarray,
                          frame_size: Tuple[int, int],
                          force_cv2: bool = False) -> np.ndarray:
    """Decode a video, retrieving/preprocessing only `indices` frames.

    Uses grab() to skip undecoded-for-display frames (decode still advances,
    but color-convert + resize run only on sampled frames).
    Returns (len(unique_indices_expanded), H, W, 3) uint8 in *index order*.

    .avi/.mp4 use the native libav* single-pass decoder when available —
    byte-exact with the cv2 path (same libavcodec decode underneath), ~5x
    faster cold (skipped stream analysis + intra-only packet skipping);
    LRCE_TPU_DISABLE_NATIVE=1 forces cv2. On a native-decode failure the
    caller must recompute `indices` against the cv2 frame count (the native
    packet count may be what was wrong) — get_video_clips does this.
    """
    if not force_cv2 and not path.lower().endswith(".gif"):
        nat = _native_video()
        if nat is not None:
            uniq = np.unique(indices).astype(np.int32)
            frames = nat.video_decode_sampled(path, uniq, frame_size)
            flat = indices.reshape(-1)
            if uniq.shape == flat.shape and np.array_equal(uniq, flat):
                return frames  # common case: already unique + sorted
            lut = {int(i): frames[k] for k, i in enumerate(uniq)}
            return np.stack([lut[int(i)] for i in flat], axis=0)
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"Error in reading video {path}")

    wanted = {}
    for i in np.unique(indices):
        wanted[int(i)] = None

    max_idx = max(wanted)
    pos = 0
    while pos <= max_idx:
        if pos in wanted:
            ok, frame = cap.read()
            if not ok:
                break
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            wanted[pos] = _pil_resize(rgb, frame_size)
        else:
            if not cap.grab():
                break
        pos += 1
    cap.release()

    missing = [i for i, v in wanted.items() if v is None]
    if missing:
        raise IOError(f"Error in reading video {path}: frames {missing[:5]} "
                      f"unreadable")
    lut = {i: v for i, v in wanted.items()}
    return np.stack([lut[int(i)] for i in indices.reshape(-1)], axis=0)


def video_to_frames(video_path: str = ".", out_dir: str = ".",
                    output_dim=(224, 224)) -> None:
    """Dump every frame of every .avi/.mp4 under video_path as JPEGs, one
    directory per video (reference utils.py:14-37 surface)."""
    import cv2

    allowed = (".avi", ".mp4")
    videos = [v for v in os.listdir(video_path)
              if os.path.splitext(v)[-1].lower() in allowed]
    for video in videos:
        cap = cv2.VideoCapture(os.path.join(video_path, video))
        out_vid_dir = os.path.join(out_dir, os.path.splitext(video)[0])
        os.makedirs(out_vid_dir, exist_ok=True)
        count = 1
        ok, image = cap.read()
        while ok:
            if output_dim:
                image = cv2.resize(image, output_dim)
            cv2.imwrite(os.path.join(out_vid_dir, f"{count:03}.jpg"), image)
            ok, image = cap.read()
            count += 1
        cap.release()


class ClipCache:
    """Thread-safe LRU cache of preprocessed uint8 clip tensors."""

    def __init__(self, max_items: int = 0):
        self.max_items = max_items
        self._store: OrderedDict = OrderedDict()
        self._lock = threading.Lock()

    def get(self, key):
        if self.max_items <= 0:
            return None
        with self._lock:
            if key in self._store:
                self._store.move_to_end(key)
                return self._store[key]
        return None

    def put(self, key, value):
        if self.max_items <= 0:
            return
        with self._lock:
            self._store[key] = value
            self._store.move_to_end(key)
            while len(self._store) > self.max_items:
                self._store.popitem(last=False)


def _native_gif_clips(path: str, frames_per_clip: int,
                      temporal_scale: Sequence[int],
                      frame_size: Tuple[int, int]) -> Optional[np.ndarray]:
    """GIF fast path through the C++ decoder + PIL-exact native resize.

    Byte-identical to the cv2+PIL path on palette GIFs (tested); returns
    None when the native library is unavailable so callers fall back.
    """
    if os.environ.get("LRCE_TPU_DISABLE_NATIVE"):
        return None
    try:
        from lrce_tpu import native
        if not native.native_available():
            return None
        _, _, n = native.gif_probe(path)
        if n < frames_per_clip:
            raise ValueError(
                f"Error in video {path}, too many frames_per_clip, "
                f"set lower value")
        idx = clip_indices(n, frames_per_clip, temporal_scale)
        frames = native.gif_decode(path, max_frames=int(idx.max()) + 1)
        sampled = np.stack([
            native.resize_bilinear(frames[int(i)], frame_size)
            for i in idx.reshape(-1)], axis=0)
        return sampled.reshape(idx.shape + sampled.shape[1:])
    except (IOError, RuntimeError):
        return None  # corrupt/unsupported GIF -> cv2 fallback


def get_video_clips(path: str, frames_per_clip: int = 5,
                    temporal_scale: Sequence[int] = (1, 2, 3),
                    frame_size: Tuple[int, int] = (224, 224),
                    cache: Optional[ClipCache] = None,
                    out_dtype=np.float32) -> np.ndarray:
    """Decode + multi-scale sample one video ->
    (sum(scales), frames_per_clip, H, W, 3); float32 in [0, 1] by default.

    Same output as the reference `_get_video_clips` (e2e_dataset.py:73-111)
    modulo layout: channels-last instead of CHW. GIFs go through the native
    C++ decoder when available. out_dtype=np.uint8 skips the host-side
    [0,1] scaling so raw bytes ship to the device (4x less transfer); the
    model normalizes on-device byte-exactly (models/e2e.py).
    """
    key = (path, tuple(temporal_scale), frames_per_clip, frame_size)
    if cache is not None:
        hit = cache.get(key)
        if hit is not None:
            if out_dtype == np.uint8:
                return hit
            return hit.astype(np.float32) / 255.0

    clips = None
    if path.lower().endswith(".gif"):
        clips = _native_gif_clips(path, frames_per_clip, temporal_scale,
                                  frame_size)
    if clips is None:
        n = count_frames_cached(path)
        if n < frames_per_clip:
            raise ValueError(
                f"Error in video {path}, too many frames_per_clip, set lower value")
        idx = clip_indices(n, frames_per_clip, temporal_scale)
        try:
            flat = decode_sampled_frames(path, idx, frame_size,
                                         force_cv2=path in _FORCE_CV2_PATHS)
        except IOError:
            # Native decode failed — the cached native packet count may be
            # the culprit (e.g. packets that never decode into frames).
            # Recount with cv2's grab() semantics, recompute the sampling
            # indices against it, and decode through cv2.
            invalidate_frame_count(path)
            _FORCE_CV2_PATHS.add(path)
            n = count_frames(path, force_cv2=True)
            with _FRAME_COUNT_LOCK:
                _FRAME_COUNT_CACHE[path] = n
            if n < frames_per_clip:
                raise ValueError(
                    f"Error in video {path}, too many frames_per_clip, "
                    f"set lower value")
            idx = clip_indices(n, frames_per_clip, temporal_scale)
            flat = decode_sampled_frames(path, idx, frame_size, force_cv2=True)
        clips = flat.reshape(idx.shape + flat.shape[1:])  # (S,fpc,H,W,3) u8

    if cache is not None:
        cache.put(key, clips)
    if out_dtype == np.uint8:
        return clips
    return clips.astype(np.float32) / 255.0
