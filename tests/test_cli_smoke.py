"""End-to-end CLI smoke test: real train.py / eval.py code paths over a
synthetic TGIF dataset with the tiny-model hook (LRCE_TPU_TINY_MODEL)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "what", "is", "the", "man", "doing", "playing", "guitar",
         "a", "dog", "runs", "red", "blue", "green", "cat", "?", "!"]


@pytest.fixture
def tgif_dir(tmp_path, monkeypatch):
    from PIL import Image

    gifs = tmp_path / "gifs"
    gifs.mkdir()
    rng = np.random.RandomState(0)
    for name, n in [("g1", 10), ("g2", 18), ("g3", 8), ("g4", 25)]:
        frames = [Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8))
                  for _ in range(n)]
        frames[0].save(gifs / f"{name}.gif", save_all=True,
                       append_images=frames[1:], duration=50, loop=0)

    ann = tmp_path / "annotations"
    ann.mkdir()
    rows = ["gif_name\tquestion\tanswer\tvid_id",
            "g1\twhat is the man doing?\tguitar\t0",
            "g2\ta dog runs!\tred\t1",
            "g3\twhat is the dog doing?\tblue\t2",
            "g4\twhat is the cat doing?\tguitar\t3"]
    for split in ("Train", "Test", "Total"):
        (ann / f"{split}_frameqa_question.csv").write_text("\n".join(rows) + "\n")

    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(VOCAB) + "\n")
    monkeypatch.setenv("LRCE_TPU_BERT_VOCAB", str(vocab_path))
    monkeypatch.setenv("LRCE_TPU_TINY_MODEL", "1")
    return tmp_path


def make_train_args(tgif_dir, tmp_path, **over):
    from lrce_tpu import config as cfg_mod

    argv = ["--dataset", "tgif-frameqa", "--dataset-dir", str(tgif_dir),
            "--log-dir", str(tmp_path / "runs"), "--batch-size", "2",
            "--epoch", "1", "--num-workers", "1", "--lr", "1e-4",
            "--use-cosine-scheduler", "--reg-strength", "0"]
    for k, v in over.items():
        argv += [k] + ([v] if isinstance(v, str) else [])
    return cfg_mod.parse_arg_train(argv)


@pytest.fixture
def tgif_mc_count_dir(tgif_dir):
    """Add action (mc) and count annotations over the same gifs."""
    ann = tgif_dir / "annotations"
    mc_rows = ["gif_name\tquestion\ta1\ta2\ta3\ta4\ta5\tanswer\tvid_id"]
    for i, (g, ans) in enumerate([("g1", 0), ("g2", 3), ("g3", 1), ("g4", 4)]):
        mc_rows.append(f"{g}\twhat is the man doing?\tplaying guitar\t"
                       f"a dog runs\tred\tblue\tgreen\t{ans}\t{i}")
    count_rows = ["gif_name\tquestion\tanswer\tvid_id"]
    for i, (g, n) in enumerate([("g1", 3), ("g2", 7), ("g3", 2), ("g4", 5)]):
        count_rows.append(f"{g}\thow many times does the dog run?\t{n}\t{i}")
    for split in ("Train", "Test", "Total"):
        (ann / f"{split}_action_question.csv").write_text(
            "\n".join(mc_rows) + "\n")
        (ann / f"{split}_count_question.csv").write_text(
            "\n".join(count_rows) + "\n")
    return tgif_dir


@pytest.mark.slow
@pytest.mark.parametrize("dataset,extra", [
    ("tgif-action", ["--use-hinge-loss"]),
    ("tgif-count", []),
])
def test_train_cli_mc_and_count(tgif_mc_count_dir, tmp_path, dataset, extra):
    """MC (QA-pair tokenization + hinge loss) and count (MSE regression)
    through the real CLI."""
    import train as train_cli
    from lrce_tpu import config as cfg_mod

    argv = ["--dataset", dataset, "--dataset-dir", str(tgif_mc_count_dir),
            "--log-dir", str(tmp_path / "runs"), "--batch-size", "2",
            "--epoch", "1", "--num-workers", "1", "--lr", "1e-4",
            "--use-cosine-scheduler", "--reg-strength", "0"] + extra
    args = cfg_mod.parse_arg_train(argv)
    train_cli.main(args)
    import os

    weights = os.listdir(args.ckpt_dir)
    assert "best.pt" in weights


@pytest.mark.slow
def test_train_then_eval_cli_end_to_end(tgif_dir, tmp_path):
    """train.py -> best.pt -> eval.py in one pass (shares the trained model
    so the suite doesn't train twice)."""
    import eval as eval_cli
    import train as train_cli
    from lrce_tpu import config as cfg_mod

    args = make_train_args(tgif_dir, tmp_path)
    train_cli.main(args)

    assert os.path.exists(os.path.join(args.log_dir, "config.json"))
    weights = os.listdir(args.ckpt_dir)
    assert "best.pt" in weights

    with open(os.path.join(args.log_dir, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["dataset"] == "tgif-frameqa"

    eval_args = cfg_mod.parse_arg_eval(
        ["--dataset", "tgif-frameqa", "--dataset-dir", str(tgif_dir),
         "--model-path", os.path.join(args.ckpt_dir, "best.pt"),
         "--batch-size", "2", "--num-workers", "1"])
    eval_cli.main(eval_args)  # must complete and log accuracy without error


@pytest.mark.slow
def test_train_ddp_cli_end_to_end(tgif_dir, tmp_path):
    """The legacy train_ddp.py entry (parser.py defaults, validates on the
    test split, reference train_ddp.py surface)."""
    import parser as legacy_parser
    import train_ddp as train_ddp_cli

    args = legacy_parser.parse_arg_train(
        ["--dataset", "tgif-frameqa", "--dataset-dir", str(tgif_dir),
         "--log-dir", str(tmp_path / "runs"), "--batch-size", "2",
         "--epoch", "1", "--num-workers", "1", "--lr", "1e-4",
         "--use-cosine-scheduler", "--reg-strength", "0",
         "--temporal-scale", "1", "2"])
    assert args.temporal_scale == [1, 2]
    train_ddp_cli.main(args)
    import os

    assert "best.pt" in os.listdir(args.ckpt_dir)


@pytest.mark.slow
def test_eval_cli_with_reference_torch_checkpoint(tgif_dir, tmp_path):
    """eval.py --model-path <reference torch .pt> must ingest a
    reference-named torch checkpoint through the converters and complete —
    the reference-checkpoint parity-evaluation workflow end to end."""
    import torch

    import eval as eval_cli
    from lrce_tpu import config as cfg_mod
    from oracle_utils import TorchE2EOracle, build_reference_named_state_dict
    from test_swin_parity import _load_reference_swin

    torch.manual_seed(0)
    oracle_mod = _load_reference_swin()
    # geometry must match the LRCE_TPU_TINY_MODEL config (e2e.config_from_args)
    swin = oracle_mod.SwinTransformer3D(
        pretrained=None, pretrained2d=False, patch_size=(2, 4, 4),
        embed_dim=8, depths=[2, 2, 2, 2], num_heads=[2, 2, 2, 2],
        window_size=(8, 7, 7), drop_path_rate=0.0, patch_norm=True)

    from transformers import BertConfig as HFConfig, BertModel

    hf = BertModel(HFConfig(
        vocab_size=30522, hidden_size=36, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=72,
        max_position_embeddings=512, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu"))

    oracle = TorchE2EOracle(swin, hf, feature_dim=36, video_dim=64,
                            num_classes=1000, text_len=30, n_clips=3,
                            t_prime=3, hw=49, fusion_layers=2,
                            fusion_heads=12, fusion_dff=72)
    sd = build_reference_named_state_dict(oracle, numpy=False)
    ckpt_path = tmp_path / "reference_best.pt"
    torch.save({"model_state_dict": sd}, str(ckpt_path))

    eval_args = cfg_mod.parse_arg_eval(
        ["--dataset", "tgif-frameqa", "--dataset-dir", str(tgif_dir),
         "--model-path", str(ckpt_path), "--batch-size", "2",
         "--num-workers", "1"])
    eval_cli.main(eval_args)  # ingests the torch ckpt and evaluates


@pytest.mark.slow
def test_parity_eval_tool_single_command(tgif_dir, tmp_path):
    """tools/parity_eval.py: the one-command parity gate converts/loads a
    checkpoint, evaluates through the real eval CLI path, prints one JSON
    line, and gates on --expected-accuracy."""
    import jax

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import parity_eval
    from lrce_tpu import config as cfg_mod
    from lrce_tpu.models.e2e import config_from_args, e2e_init_jit
    from lrce_tpu.utils import checkpoint as C

    eval_args = cfg_mod.parse_arg_eval(
        ["--dataset", "tgif-frameqa", "--dataset-dir", str(tgif_dir),
         "--model-path", "unused", "--batch-size", "2",
         "--num-workers", "1"])
    params = e2e_init_jit(jax.random.PRNGKey(0), config_from_args(eval_args))
    ckpt = tmp_path / "model.pt"
    C.save_checkpoint(str(ckpt), params)

    base = ["--dataset", "tgif-frameqa", "--dataset-dir", str(tgif_dir),
            "--model-path", str(ckpt), "--batch-size", "2",
            "--num-workers", "1"]
    assert parity_eval.main(base) == 0
    # measured accuracy of an untrained tiny model is ~0-50%; a tolerance of
    # 100 points always passes, 1e-9 against an impossible target never does
    assert parity_eval.main(
        base + ["--expected-accuracy", "0", "--tolerance", "100"]) == 0
    assert parity_eval.main(
        base + ["--expected-accuracy", "999", "--tolerance", "1e-9"]) == 1
    # missing artifact => explicit error code, not a crash
    assert parity_eval.main(
        ["--dataset", "tgif-frameqa", "--dataset-dir", str(tgif_dir),
         "--model-path", str(tmp_path / "absent.pt")]) == 2
