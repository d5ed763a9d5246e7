"""Tests for the CLI/config system and vocabulary builders."""

import json

import pytest

from lrce_tpu import config as cfg
from lrce_tpu.utils import vocab


def test_parse_arg_train_merges_config():
    args = cfg.parse_arg_train(["--dataset", "msvd-qa-oe", "--dataset-dir", "/tmp"])
    assert args.feature_dim == 768
    assert args.num_classes == 1000
    assert args.text_seq_len == 32
    assert args.task_type == "oe"
    assert args.video_feature_dim == 1024
    # lr broadcast 1 -> 3 (reference args.py:110-111)
    assert args.lr == [5e-6, 5e-6, 5e-6]
    # plateau scheduler default: cosine keys pruned (reference args.py:94-99)
    assert not hasattr(args, "lr_restart_epoch")
    assert hasattr(args, "patience")
    assert not hasattr(args, "margin")


def test_parse_arg_train_cosine_prunes_patience():
    args = cfg.parse_arg_train([
        "--dataset", "tgif-action", "--dataset-dir", "/tmp",
        "--use-cosine-scheduler", "--use-hinge-loss", "--lr", "1e-5", "2e-5", "3e-5",
    ])
    assert not hasattr(args, "patience")
    assert args.lr_restart_epoch == 2
    assert args.margin == 1
    assert args.lr == [1e-5, 2e-5, 3e-5]
    assert args.task_type == "mc"


def test_parse_arg_eval():
    args = cfg.parse_arg_eval([
        "--dataset", "tgif-count", "--dataset-dir", "/tmp", "--model-path", "/x.pt"])
    assert args.task_type == "count"
    assert args.num_classes == 1
    assert args.temporal_scale == [3]


def test_msrvtt_quirks_preserved():
    # The reference config carries a typo'd name and num_classes=1500 while the
    # dataset builds a top-1000 vocab (reference configs/msrvtt-qa-oe.json:2,12).
    c = cfg.load_model_config("msrvtt-qa-oe")
    assert c["dataset"] == "msvrvtt-qa-oe"
    assert c["num_classes"] == 1500


def test_build_common_answer_dict(tmp_path):
    qa = [{"answer": a} for a in ["cat", "dog", "cat", "bird", "dog", "cat"]]
    f = tmp_path / "train.json"
    f.write_text(json.dumps(qa))
    d = vocab.build_common_answer_dict([str(f)], k=2)
    assert d == {"cat": 0, "dog": 1}


def test_build_answer_dict_first_seen_order(tmp_path):
    qa = [{"answer": a} for a in ["x", "y", "x", "z"]]
    f = tmp_path / "a.json"
    f.write_text(json.dumps(qa))
    assert vocab.build_answer_dict([str(f)]) == {"x": 0, "y": 1, "z": 2}


def test_parse_tgif_annot(tmp_path):
    csv = "gif_name\tquestion\tanswer\tvid_id\n" \
          "g1\tq1\tred\t0\n" "g2\tq2\tblue\t1\n" "g3\tq3\tred\t2\n"
    f = tmp_path / "Total_frameqa_question.csv"
    f.write_text(csv)
    ans, vid = vocab.parse_tgif_annot(str(f), "oe", k=10)
    assert ans == {"red": 0, "blue": 1}
    assert vid == {"g1": 0, "g2": 1, "g3": 2}
    ans_count, _ = vocab.parse_tgif_annot(str(f), "count")
    assert ans_count == {"red": "red", "blue": "blue"}


def test_build_video_dict(tmp_path):
    f = tmp_path / "annotations.txt"
    f.write_text("vidA 1 foo\nvidB 2 bar\nvidA 3 baz\n")
    assert vocab.build_video_dict(str(f), start_idx=1) == {"vidA": 1, "vidB": 2}
