"""E2E model composition tests: shapes for all three tasks on a scaled-down
config, plus checkpoint round-trip through the torch converter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lrce_tpu.models import bert as B
from lrce_tpu.models import e2e as E
from lrce_tpu.models import swin3d as S


def tiny_cfg(task="oe", num_classes=7):
    # Video: 16x16 frames, patch (2,4,4) -> 4x4 spatial at stage0; one stage.
    swin = S.SwinConfig(patch_size=(2, 4, 4), embed_dim=16, depths=(2,),
                        num_heads=(2,), window_size=(2, 3, 3),
                        drop_path_rate=0.0, patch_norm=True)
    bert = B.BertConfig(vocab_size=100, hidden_size=24, num_layers=2,
                        num_heads=2, intermediate_size=48,
                        max_position_embeddings=32, type_vocab_size=2,
                        hidden_dropout=0.0, attention_dropout=0.0)
    return E.E2EConfig(feature_dim=24, num_classes=num_classes,
                       drop_out_rate=0.0, video_feature_res=(4, 4),
                       video_feature_dim=16, frame_sample_size=5,
                       temporal_scale=(1, 2), text_seq_len=8,
                       task_type=task, bert=bert, swin=swin)


def make_inputs(cfg, batch=2, mc=False):
    rng = np.random.RandomState(0)
    s = sum(cfg.temporal_scale)
    clips = jnp.asarray(rng.rand(batch, s, 5, 16, 16, 3).astype(np.float32))
    shape = (batch, 5, cfg.text_seq_len) if mc else (batch, cfg.text_seq_len)
    ids = jnp.asarray(rng.randint(0, 100, shape))
    mask = jnp.ones(shape, jnp.int32)
    types = jnp.zeros(shape, jnp.int32)
    return clips, ids, mask, types


@pytest.mark.parametrize("task,out_shape", [
    ("oe", (2, 7)), ("mc", (2, 5)), ("count", (2,))])
def test_e2e_forward_shapes(task, out_shape):
    # mc uses num_classes=1 (one score per QA pair, reference configs/tgif-action.json)
    cfg = tiny_cfg(task, num_classes=1 if task == "mc" else 7)
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    clips, ids, mask, types = make_inputs(cfg, mc=(task == "mc"))
    out = E.e2e_forward(params, clips, ids, mask, types, cfg)
    assert out.shape == out_shape
    assert np.isfinite(np.asarray(out)).all()
    if task == "count":
        assert (np.asarray(out) >= 0).all()


@pytest.mark.slow
def test_e2e_jit_and_grad():
    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    clips, ids, mask, types = make_inputs(cfg)
    labels = jnp.asarray([1, 2])

    @jax.jit
    def loss_fn(p):
        logits = E.e2e_forward(p, clips, ids, mask, types, cfg)
        one_hot = jax.nn.one_hot(labels, cfg.num_classes)
        return -jnp.mean(jnp.sum(one_hot * jax.nn.log_softmax(logits), -1))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # every major component receives gradient
    gsum = float(sum(jnp.abs(g).sum() for g in flat))
    assert gsum > 0


def test_uint8_clips_byte_exact_with_float_path():
    """uint8 device transfer (--uint8-transfer) must be BYTE-EXACT with the
    host float32 path: uint8 -> f32 is exact and IEEE f32 division matches
    numpy's (models/e2e.py device-side normalization)."""
    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    s = sum(cfg.temporal_scale)
    raw = rng.randint(0, 256, (2, s, 5, 16, 16, 3)).astype(np.uint8)
    _, ids, mask, types = make_inputs(cfg)

    host_float = jnp.asarray(raw.astype(np.float32) / 255.0)
    out_f = E.e2e_forward(params, host_float, ids, mask, types, cfg)
    out_u8 = E.e2e_forward(params, jnp.asarray(raw), ids, mask, types, cfg)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_u8))


def test_video_extractor_matches_per_clip_loop():
    """Folding clips into the batch must equal running Swin per clip."""
    cfg = tiny_cfg("oe")
    params = E.e2e_init(jax.random.PRNGKey(1), cfg)
    clips, *_ = make_inputs(cfg)
    batched = E.extract_video_features(params["video_extractor"], clips, cfg)

    from lrce_tpu.constants import IMAGENET_MEAN, IMAGENET_STD
    outs = []
    for i in range(clips.shape[1]):
        x = (clips[:, i] - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        f = S.swin_forward(params["video_extractor"], x, cfg.swin)
        b, tp, hp, wp, c = f.shape
        outs.append(f.reshape(b, tp, hp * wp, c))
    looped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(looped),
                               rtol=1e-5, atol=1e-5)
