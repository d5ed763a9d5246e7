"""Offline feature / frame-bank extraction (the reference's legacy path).

Covers the reference's offline entry points in one CLI (reference
lrce/feature_extractor/video.py:46-115, text.py:20-168, and the frame-dump
block e2e_dataset.py:381-410):

  frames  — precompute per-video multi-scale clip banks (.npy) for the
            `is_frame_extracted` dataset path (scales [1,2,3,4] by default so
            any scale subset can be selected at train time via scale_idx).
  video   — run clips through the Swin encoder and dump per-video features
            (.pkl) shaped (n_clips, T', HW, 1024).
  text    — tokenize+encode questions through BERT and dump per-question
            features (.pkl).

Usage:
  python tools/extract_features.py frames --videos-dir D --out-dir O [--scales 1 2 3 4]
  python tools/extract_features.py video  --videos-dir D --out-dir O [--batch 8]
  python tools/extract_features.py text   --annotation A --out-dir O [--tgif] [--max-len 30]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, ".")

import numpy as np

from lrce_tpu.constants import VIDEO_EXT


def list_videos(videos_dir: str):
    return sorted(v for v in os.listdir(videos_dir)
                  if os.path.splitext(v)[1].lower() in VIDEO_EXT)


def cmd_frames(args) -> None:
    from lrce_tpu.data.video_decode import get_video_clips

    os.makedirs(args.out_dir, exist_ok=True)
    videos = list_videos(args.videos_dir)
    for i, name in enumerate(videos):
        stem = os.path.splitext(name)[0]
        out = os.path.join(args.out_dir, f"{stem}.npy")
        if os.path.exists(out) and not args.overwrite:
            continue
        clips = get_video_clips(os.path.join(args.videos_dir, name),
                                args.frames_per_clip, args.scales,
                                (args.frame_size, args.frame_size))
        np.save(out, clips.astype(np.float32))
        if i % 50 == 0:
            print(f"[{i}/{len(videos)}] {name}")
    print(f"wrote {len(videos)} clip banks to {args.out_dir}")


def cmd_video(args) -> None:
    import jax
    import jax.numpy as jnp

    from lrce_tpu.data.video_decode import get_video_clips
    from lrce_tpu.models import e2e as E
    from lrce_tpu.models import swin3d as S
    from lrce_tpu.pretrained import load_pretrained

    cfg = E.E2EConfig(temporal_scale=tuple(args.scales))
    params = E.e2e_init_jit(jax.random.PRNGKey(0), cfg)
    params = load_pretrained(params, swin_path=args.swin_ckpt)

    fwd = jax.jit(lambda p, clips: E.extract_video_features(
        p, clips, cfg, deterministic=True, compute_dtype=jnp.bfloat16))

    os.makedirs(args.out_dir, exist_ok=True)
    videos = list_videos(args.videos_dir)
    batch_names, batch_clips = [], []

    def flush():
        if not batch_names:
            return
        clips = jnp.asarray(np.stack(batch_clips))
        feats = np.asarray(fwd(params["video_extractor"], clips
                               ).astype(jnp.float32))
        for name, f in zip(batch_names, feats):
            stem = os.path.splitext(name)[0]
            with open(os.path.join(args.out_dir, f"{stem}.pkl"), "wb") as fh:
                pickle.dump(f, fh)
        batch_names.clear()
        batch_clips.clear()

    for i, name in enumerate(videos):
        clips = get_video_clips(os.path.join(args.videos_dir, name),
                                args.frames_per_clip, args.scales,
                                (args.frame_size, args.frame_size))
        batch_names.append(name)
        batch_clips.append(clips)
        if len(batch_names) == args.batch:
            flush()
        if i % 50 == 0:
            print(f"[{i}/{len(videos)}] {name}")
    flush()
    print(f"wrote features for {len(videos)} videos to {args.out_dir}")


def cmd_text(args) -> None:
    import jax
    import jax.numpy as jnp

    from lrce_tpu.data.tokenizer import load_default_tokenizer
    from lrce_tpu.models import bert as B
    from lrce_tpu.pretrained import load_pretrained

    params = {"text_extractor": jax.jit(
        lambda: B.bert_init(jax.random.PRNGKey(0)))()}
    params = load_pretrained(params, bert_path=args.bert_ckpt)
    tok = load_default_tokenizer()

    fwd = jax.jit(lambda p, ids, mask, types: B.bert_encode(
        p, ids, mask, types, compute_dtype=jnp.bfloat16))

    if args.tgif:
        import pandas as pd

        data = pd.read_csv(args.annotation, delimiter="\t")
        questions = [(str(row.get("vid_id", i)), row["question"])
                     for i, row in data.iterrows()]
    else:
        import json

        with open(args.annotation) as f:
            qa_list = json.load(f)
        questions = [(str(qa.get("id", i)), qa["question"])
                     for i, qa in enumerate(qa_list)]

    os.makedirs(args.out_dir, exist_ok=True)
    for start in range(0, len(questions), args.batch):
        chunk = questions[start:start + args.batch]
        enc = [tok.encode(q, max_length=args.max_len) for _, q in chunk]
        ids = jnp.asarray(np.stack([e[0] for e in enc]))
        mask = jnp.asarray(np.stack([e[1] for e in enc]))
        types = jnp.asarray(np.stack([e[2] for e in enc]))
        feats = np.asarray(fwd(params["text_extractor"], ids, mask, types
                               ).astype(jnp.float32))
        for (qid, _), f in zip(chunk, feats):
            with open(os.path.join(args.out_dir, f"{qid}.pkl"), "wb") as fh:
                pickle.dump(f, fh)
    print(f"wrote features for {len(questions)} questions to {args.out_dir}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pf = sub.add_parser("frames")
    pf.add_argument("--videos-dir", required=True)
    pf.add_argument("--out-dir", required=True)
    pf.add_argument("--scales", nargs="+", type=int, default=[1, 2, 3, 4])
    pf.add_argument("--frames-per-clip", type=int, default=5)
    pf.add_argument("--frame-size", type=int, default=224)
    pf.add_argument("--overwrite", action="store_true")

    pv = sub.add_parser("video")
    pv.add_argument("--videos-dir", required=True)
    pv.add_argument("--out-dir", required=True)
    pv.add_argument("--scales", nargs="+", type=int, default=[1, 2, 3])
    pv.add_argument("--frames-per-clip", type=int, default=5)
    pv.add_argument("--frame-size", type=int, default=224)
    pv.add_argument("--batch", type=int, default=8)
    pv.add_argument("--swin-ckpt", default=None)

    pt = sub.add_parser("text")
    pt.add_argument("--annotation", required=True)
    pt.add_argument("--out-dir", required=True)
    pt.add_argument("--tgif", action="store_true")
    pt.add_argument("--max-len", type=int, default=30)
    pt.add_argument("--batch", type=int, default=256)
    pt.add_argument("--bert-ckpt", default=None)

    args = p.parse_args(argv)
    {"frames": cmd_frames, "video": cmd_video, "text": cmd_text}[args.cmd](args)


if __name__ == "__main__":
    main()
