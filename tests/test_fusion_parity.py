"""Golden parity tests: JAX fusion stack vs torch oracles with transplanted
random weights. The torch modules here are *test-only oracles* built from
torch.nn primitives with the same hyperparameters the reference uses
(reference lrce/models/fusionv3.py:5-51, lrce/models/embedding.py:10-63)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from lrce_tpu.models import fusion as F
from lrce_tpu.models.embedding import (
    text_pos_embed,
    video_pos_embed,
)
from lrce_tpu.utils import torch_io as tio

TOL = dict(rtol=2e-4, atol=2e-5)


def make_torch_decoder(dim=64, nhead=4, dff=128, num_layers=3):
    layer = tnn.TransformerDecoderLayer(
        d_model=dim, nhead=nhead, dropout=0.0, dim_feedforward=dff,
        batch_first=True, layer_norm_eps=1e-12,
        activation=torch.nn.functional.gelu)
    return tnn.TransformerDecoder(layer, num_layers=num_layers)


def test_decoder_layer_matches_torch():
    torch.manual_seed(0)
    dim, nhead, dff = 48, 12, 96
    layer = tnn.TransformerDecoderLayer(
        d_model=dim, nhead=nhead, dropout=0.0, dim_feedforward=dff,
        batch_first=True, layer_norm_eps=1e-12,
        activation=torch.nn.functional.gelu).eval()

    sd = {k: v.detach().numpy() for k, v in layer.state_dict().items()}
    params = tio.convert_decoder_layer({f"x.{k}": v for k, v in sd.items()}, "x")

    tgt = torch.randn(2, 1, dim)
    mem = torch.randn(2, 9, dim)
    with torch.no_grad():
        ref = layer(tgt, mem).numpy()

    got = F.decoder_layer(params, jnp.asarray(tgt.numpy()),
                          jnp.asarray(mem.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


def test_decoder_stack_matches_torch():
    torch.manual_seed(1)
    dim, num_layers = 48, 3
    dec = make_torch_decoder(dim=dim, nhead=4, dff=96, num_layers=num_layers).eval()
    sd = {k: v.detach().numpy() for k, v in dec.state_dict().items()}
    layers = tio._stack([tio.convert_decoder_layer(sd, f"layers.{i}")
                         for i in range(num_layers)])

    tgt = torch.randn(2, 1, dim)
    mem = torch.randn(2, 7, dim)
    with torch.no_grad():
        ref = dec(tgt, mem).numpy()
    got = F.decoder_stack(layers, jnp.asarray(tgt.numpy()),
                          jnp.asarray(mem.numpy()), num_heads=4)
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


class TorchFusionOracle(tnn.Module):
    """Reference-equivalent fusion recurrence built from torch primitives
    (semantics from reference lrce/models/fusionv3.py:27-51)."""

    def __init__(self, dim=48, nhead=4, dff=96, num_layers=3):
        super().__init__()
        self.transformer = make_torch_decoder(dim, nhead, dff, num_layers)
        self.fusion_layer_norm = tnn.LayerNorm(dim, eps=1e-12)
        self.summarization_token = tnn.Parameter(torch.randn(1, 1, dim))

    def forward(self, video_features, text_features):
        batch, n_clips, _, _ = video_features.shape
        token = self.summarization_token.expand([batch, -1, -1])
        for i in range(n_clips):
            mem = torch.concat([video_features[:, i], text_features], dim=1)
            token = self.fusion_layer_norm(token + self.transformer(token, mem))
        return token


def test_fusion_transformer_matches_torch():
    torch.manual_seed(2)
    dim, num_layers = 48, 3
    oracle = TorchFusionOracle(dim=dim, num_layers=num_layers).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = {
        "layers": tio._stack([
            tio.convert_decoder_layer(sd, f"transformer.layers.{i}")
            for i in range(num_layers)]),
        "fusion_layer_norm": tio.convert_layer_norm(sd, "fusion_layer_norm"),
        "summarization_token": sd["summarization_token"],
    }
    vid = torch.randn(2, 3, 10, dim)
    txt = torch.randn(2, 6, dim)
    with torch.no_grad():
        ref = oracle(vid, txt).numpy()
    got = F.fusion_transformer(params, jnp.asarray(vid.numpy()),
                               jnp.asarray(txt.numpy()), num_heads=4)
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


def test_text_pos_embed_matches_torch():
    torch.manual_seed(3)
    dim, seq = 32, 6
    emb_cls = torch.randn(1, 1, dim)
    emb_pos = torch.randn(1, 1 + seq, dim)
    ln = tnn.LayerNorm(dim, eps=1e-12).eval()
    x = torch.randn(2, seq, dim)
    with torch.no_grad():
        ref = ln(torch.cat([emb_cls.expand(2, -1, -1), x], dim=1)
                 + emb_pos.expand(2, -1, -1)).numpy()

    params = {
        "emb_cls": emb_cls.numpy(), "emb_pos": emb_pos.numpy(),
        "layer_norm": {"scale": ln.weight.detach().numpy(),
                       "bias": ln.bias.detach().numpy()},
    }
    got = text_pos_embed(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


def test_video_pos_embed_matches_torch():
    """Replicates the reference's 4-factor broadcast chain
    (lrce/models/embedding.py:47-63)."""
    torch.manual_seed(4)
    dim, n_clips, t, hw = 16, 6, 3, 9
    emb_cls = torch.randn(1, 1, 1, 1, dim)
    emb_pos = torch.randn(1, 1, 1, 1 + hw, dim)
    emb_len = torch.randn(1, 1, t, 1, dim)
    emb_clip = torch.randn(1, n_clips, 1, 1, dim)
    ln = tnn.LayerNorm(dim, eps=1e-12).eval()
    x = torch.randn(2, n_clips, t, hw, dim)

    with torch.no_grad():
        y = torch.cat([emb_cls.expand(2, n_clips, t, -1, -1), x], dim=3)
        y = y + emb_pos.expand(2, n_clips, t, -1, -1)
        y = y + emb_len.expand(2, n_clips, -1, 1 + hw, -1)
        y = y + emb_clip.expand(2, -1, t, 1 + hw, -1)
        y = ln(y)
        ref = y.view(2, n_clips, t * (1 + hw), -1).numpy()

    params = {
        "emb_cls": emb_cls.numpy(), "emb_pos": emb_pos.numpy(),
        "emb_len": emb_len.numpy(), "emb_clip": emb_clip.numpy(),
        "layer_norm": {"scale": ln.weight.detach().numpy(),
                       "bias": ln.bias.detach().numpy()},
    }
    got = video_pos_embed(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


def test_heads_shapes():
    import jax

    rng = jax.random.PRNGKey(0)
    scales = [1, 2]
    s = sum(scales)
    p = F.lrce_open_ended_init(rng, 48, 11, (3, 3), 64, 5, scales, 6)
    vid = jnp.ones((2, s, 3, 9, 64))
    txt = jnp.ones((2, 6, 48))
    out = F.lrce_open_ended(p, vid, txt)
    assert out.shape == (2, 11)

    pmc = F.lrce_multiple_choice_init(rng, 48, 1, (3, 3), 64, 5, scales, 6)
    txt_mc = jnp.ones((2, 5, 6, 48))
    out = F.lrce_multiple_choice(pmc, vid, txt_mc)
    assert out.shape == (2, 5)

    pc = F.lrce_count_init(rng, 48, (3, 3), 64, 5, scales, 6)
    out = F.lrce_count(pc, vid, txt)
    assert out.shape == (2,)
    assert (np.asarray(out) >= 0).all()
