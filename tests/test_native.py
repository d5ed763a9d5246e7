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
