"""Native C++ runtime parity tests: WordPiece vs the Python tokenizer,
bilinear resize vs PIL (byte-exact), GIF decode vs PIL."""

import numpy as np
import pytest

from lrce_tpu import native
from lrce_tpu.data.tokenizer import BertWordPieceTokenizer

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native toolchain unavailable")

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "what", "is", "the", "man", "doing", "play", "##ing", "guitar",
         "a", "dog", "run", "##s", ",", "?", "!", "'", "s", "red", "blue",
         "##uit", "##ar", "gu", "cat"]


@pytest.fixture
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_wordpiece_matches_python(vocab_file):
    py = BertWordPieceTokenizer(vocab_file)
    cc = native.NativeWordPiece(vocab_file)
    cases = [
        "What is the man doing?",
        "a dog runs!",
        "Playing GUITAR, what?",
        "the man's dog",
        "unknownword what",
        "gu itar guit",
        "",
        "  what   is  ",
        "a" * 150,  # > max word chars -> [UNK]
    ]
    for text in cases:
        ref = py.encode(text, max_length=16)
        got = cc.encode(text, max_length=16)
        assert got is not None, text
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(a, b, err_msg=text)


def test_wordpiece_pair_matches_python(vocab_file):
    py = BertWordPieceTokenizer(vocab_file)
    cc = native.NativeWordPiece(vocab_file)
    ref = py.encode("what is the man doing?", "playing guitar", max_length=20)
    got = cc.encode("what is the man doing?", "playing guitar", max_length=20)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)


def test_wordpiece_nonascii_falls_back(vocab_file):
    cc = native.NativeWordPiece(vocab_file)
    assert cc.encode("guitár", max_length=8) is None


def test_resize_matches_pil_exact():
    from PIL import Image

    rng = np.random.RandomState(0)
    for (h, w), (oh, ow) in [((48, 64), (224, 224)), ((300, 200), (224, 224)),
                             ((224, 224), (112, 112)), ((17, 31), (16, 16))]:
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        ref = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR))
        got = native.resize_bilinear(img, (oh, ow))
        np.testing.assert_array_equal(got, ref, err_msg=f"{(h, w)}->{(oh, ow)}")


def test_gif_decode_matches_pil(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    frames = [Image.fromarray(rng.randint(0, 255, (24, 30, 3), np.uint8))
              for _ in range(7)]
    path = tmp_path / "t.gif"
    frames[0].save(path, save_all=True, append_images=frames[1:], duration=40,
                   loop=0)

    got = native.gif_decode(str(path))

    pil = Image.open(path)
    refs = []
    try:
        while True:
            refs.append(np.asarray(pil.convert("RGB")))
            pil.seek(pil.tell() + 1)
    except EOFError:
        pass
    ref = np.stack(refs)

    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_gif_probe(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(2)
    frames = [Image.fromarray(rng.randint(0, 255, (10, 12, 3), np.uint8))
              for _ in range(4)]
    path = tmp_path / "p.gif"
    frames[0].save(path, save_all=True, append_images=frames[1:], duration=40)
    w, h, n = native.gif_probe(str(path))
    assert (w, h, n) == (12, 10, 4)


# ---------------------------------------------------------------------------
# Native .avi/.mp4 decode (liblrce_video.so via system libav*)
# ---------------------------------------------------------------------------

needs_video = pytest.mark.skipif(not native.video_available(),
                                 reason="liblrce_video unavailable")


def _write_mjpg_avi(path, n_frames=23, size=(48, 40)):
    import cv2

    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 25, size)
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:size[1], 0:size[0]].astype(np.float32)
    for t in range(n_frames):
        img = (128 + 100 * np.sin(xx / 9 + t / 2)
               * np.cos(yy / 7 - t / 3)).astype(np.uint8)
        w.write(np.stack([img, np.roll(img, t, 1), 255 - img], -1))
    w.release()


@needs_video
def test_video_probe_matches_cv2_count(tmp_path):
    path = tmp_path / "v.avi"
    _write_mjpg_avi(path)
    n, w, h = native.video_probe(str(path))
    assert (w, h) == (48, 40)
    # compare against the cv2 grab sweep explicitly (count_frames itself
    # routes through the native probe, so it would be circular here)
    import cv2

    cap = cv2.VideoCapture(str(path))
    n_cv = 0
    while cap.grab():
        n_cv += 1
    cap.release()
    assert n == n_cv == 23


@needs_video
def test_video_decode_sampled_byte_exact_with_cv2(tmp_path):
    """The native path and the cv2 path share libavcodec underneath, so the
    decoded+resized frames must be byte-identical (the guarantee that lets
    the native path be the default without a parity caveat)."""
    import os

    from lrce_tpu.data import video_decode as VD

    path = tmp_path / "v.avi"
    _write_mjpg_avi(path)
    idx = np.array([0, 2, 9, 9, 22])  # duplicates + first/last
    got = VD.decode_sampled_frames(str(path), idx, (32, 36))
    os.environ["LRCE_TPU_DISABLE_NATIVE"] = "1"
    try:
        ref = VD.decode_sampled_frames(str(path), idx, (32, 36))
    finally:
        del os.environ["LRCE_TPU_DISABLE_NATIVE"]
    np.testing.assert_array_equal(got, ref)


@needs_video
def test_get_video_clips_native_avi(tmp_path):
    """End-to-end get_video_clips over the native .avi path, incl. cache."""
    from lrce_tpu.data.video_decode import ClipCache, get_video_clips

    path = tmp_path / "v.avi"
    _write_mjpg_avi(path)
    cache = ClipCache(2)
    a = get_video_clips(str(path), 5, (1, 2), (24, 24), cache)
    assert a.shape == (3, 5, 24, 24, 3) and a.dtype == np.float32
    b = get_video_clips(str(path), 5, (1, 2), (24, 24), cache)
    np.testing.assert_array_equal(a, b)


def _write_mp4v(path, n_frames=100, size=(64, 48)):
    """An INTER-codec fixture (MPEG-4 part 2, cv2's default mp4 encoder
    here, GOP ~12): packets reference previous frames, so the native
    decoder's keyframe-seek plan — not the intra-only packet skipping —
    serves sampled fetches."""
    import cv2

    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25, size)
    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:size[1], 0:size[0]].astype(np.float32)
    for t in range(n_frames):
        img = (128 + 100 * np.sin(xx / 9 + t / 2)
               * np.cos(yy / 7 - t / 3)).astype(np.uint8)
        w.write(np.stack([img, np.roll(img, t, 1), 255 - img], -1))
    w.release()


@needs_video
def test_video_mp4_seek_decode_byte_exact_with_cv2(tmp_path):
    """Inter-codec (.mp4 — the MSRVTT container) sampled decode routes
    through the keyframe-seek plan (native/video.cpp decode_with_seeks):
    only GOP segments containing sampled frames decode, vs the reference
    decoding every frame up to the max sampled index
    (reference lrce/dataset/e2e_dataset.py:76-84). Sync-sample decode is
    deterministic, so the output must stay byte-identical with cv2's
    linear read — including duplicate indices and the final frame."""
    import os

    from lrce_tpu.data import video_decode as VD

    path = tmp_path / "v.mp4"
    _write_mp4v(path)
    n, w, h = native.video_probe(str(path))
    assert (n, w, h) == (100, 64, 48)

    idx = np.array([0, 3, 17, 17, 40, 77, 99])
    got = VD.decode_sampled_frames(str(path), idx, (32, 36))
    os.environ["LRCE_TPU_DISABLE_NATIVE"] = "1"
    try:
        ref = VD.decode_sampled_frames(str(path), idx, (32, 36))
    finally:
        del os.environ["LRCE_TPU_DISABLE_NATIVE"]
    np.testing.assert_array_equal(got, ref)


@needs_video
def test_native_failure_recounts_with_cv2(tmp_path, monkeypatch):
    """When the native probe's count disagrees with what native decode can
    deliver, get_video_clips must invalidate the cached count, recount with
    cv2 grab() semantics, recompute sampling indices, and decode through cv2
    (ADVICE r2: stale native counts previously made the cv2 fallback fail
    too). The path is then pinned to cv2 for later fetches."""
    from lrce_tpu import native as nat
    from lrce_tpu.data import video_decode as VD

    path = tmp_path / "v.avi"
    _write_mjpg_avi(path)
    monkeypatch.setattr(VD, "_FRAME_COUNT_CACHE", {})
    monkeypatch.setattr(VD, "_FORCE_CV2_PATHS", set())

    # Native probe overcounts (simulating zero-size/undecodable packets) and
    # native decode refuses the resulting out-of-range indices.
    monkeypatch.setattr(nat, "video_probe", lambda p: (40, 48, 40))

    def failing(p, idx, size):
        raise IOError("frames not decodable")

    monkeypatch.setattr(nat, "video_decode_sampled", failing)

    got = VD.get_video_clips(str(path), 5, (1, 2), (24, 24))
    assert str(path) in VD._FORCE_CV2_PATHS
    assert VD._FRAME_COUNT_CACHE[str(path)] == 23  # cv2 grab count

    ref = VD.get_video_clips(str(path), 5, (1, 2), (24, 24))  # pinned cv2
    np.testing.assert_array_equal(got, ref)
