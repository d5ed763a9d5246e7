"""Host-ingest benchmark: sustained clips/s for the .avi (MSVD/MSRVTT) path.

The reference decodes every frame of every video on every sample fetch
(reference lrce/dataset/e2e_dataset.py:76-92). This tool measures our
decode path in the three regimes that matter for training throughput:

  cold        — first-ever visit: count_frames sweep + sampled decode
  warm-count  — frame count cached (every revisit of a video in epoch >= 1;
                Microsoft datasets average ~10-25 questions per video)
  warm-clip   — clip LRU hit (--cache-items > 0): no decode at all

Synthesizes MJPG .avi files (no dataset needed) and reports clips/s with
the thread count of the training DataLoader.

Usage: python tools/bench_ingest.py [--videos 12] [--frames 60]
       [--questions-per-video 8] [--threads 4]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, ".")


def make_videos(out_dir: str, n_videos: int, n_frames: int) -> list:
    import cv2

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n_videos):
        path = f"{out_dir}/vid{i:03d}.avi"
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25,
                            (320, 240))
        for _ in range(n_frames):
            w.write(rng.randint(0, 255, (240, 320, 3), np.uint8))
        w.release()
        paths.append(path)
    return paths


def run_epoch(paths, questions_per_video, threads, cache) -> float:
    """One simulated epoch: every video fetched questions_per_video times
    (interleaved, like a shuffled question list). Returns clips/s."""
    from lrce_tpu.data.video_decode import get_video_clips

    work = [p for _ in range(questions_per_video) for p in paths]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(threads) as pool:
        clips = list(pool.map(
            lambda p: get_video_clips(p, 5, (1, 2, 3), (224, 224), cache),
            work))
    dt = time.perf_counter() - t0
    n_clips = sum(c.shape[0] for c in clips)
    return n_clips / dt


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--videos", type=int, default=12)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--questions-per-video", type=int, default=8)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args(argv)

    from lrce_tpu.data import video_decode as VD

    with tempfile.TemporaryDirectory() as td:
        paths = make_videos(td, args.videos, args.frames)

        # cold: no caches at all
        VD._FRAME_COUNT_CACHE.clear()
        cold = run_epoch(paths, 1, args.threads, None)
        print(f"cold decode:        {cold:8.1f} clips/s "
              f"({args.threads} threads)")

        # warm-count: counts cached, clips not
        warm_count = run_epoch(paths, args.questions_per_video, args.threads,
                               None)
        print(f"warm frame-count:   {warm_count:8.1f} clips/s")

        # warm-clip: LRU large enough for the working set
        cache = VD.ClipCache(max_items=args.videos)
        run_epoch(paths, 1, args.threads, cache)  # fill
        warm_clip = run_epoch(paths, args.questions_per_video, args.threads,
                              cache)
        print(f"warm clip-cache:    {warm_clip:8.1f} clips/s")


if __name__ == "__main__":
    main()
