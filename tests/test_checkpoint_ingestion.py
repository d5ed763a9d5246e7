"""Golden end-to-end checkpoint-ingestion test.

Assembles a torch state dict with the EXACT reference module naming
(fusion_model.* / text_extractor.bert.* / video_extractor.swin.*, reference
lrce/models/e2e.py:7-25), converts it with convert_e2e (structure
auto-inferred from keys), and verifies that the JAX e2e_forward reproduces
the chained torch computation — the full reference forward — on the same
inputs."""

import numpy as np
import torch

import jax.numpy as jnp

from lrce_tpu.models import bert as B
from lrce_tpu.models import e2e as E
from lrce_tpu.models import swin3d as S
from lrce_tpu.utils import torch_io as tio

from oracle_utils import TorchE2EOracle, build_reference_named_state_dict
from test_swin_parity import _load_reference_swin  # noqa: E402

TOL = dict(rtol=5e-4, atol=5e-4)


def test_reference_checkpoint_roundtrip():
    torch.manual_seed(0)
    oracle_mod = _load_reference_swin()
    swin_cfg = S.SwinConfig(patch_size=(2, 2, 2), embed_dim=16, depths=(2, 2),
                            num_heads=(2, 4), window_size=(2, 3, 3),
                            drop_path_rate=0.0, patch_norm=True)
    swin = oracle_mod.SwinTransformer3D(
        pretrained=None, pretrained2d=False, patch_size=swin_cfg.patch_size,
        embed_dim=swin_cfg.embed_dim, depths=list(swin_cfg.depths),
        num_heads=list(swin_cfg.num_heads), window_size=swin_cfg.window_size,
        drop_path_rate=0.0, patch_norm=True)

    from transformers import BertConfig as HFConfig, BertModel

    dim, n_cls, text_len, n_clips = 48, 13, 7, 2
    hf = BertModel(HFConfig(
        vocab_size=120, hidden_size=dim, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu"))

    oracle = TorchE2EOracle(swin, hf, feature_dim=dim, video_dim=32,
                            num_classes=n_cls, text_len=text_len,
                            n_clips=n_clips, t_prime=3, hw=9,
                            fusion_layers=2, fusion_heads=12, fusion_dff=96)
    oracle.eval()

    clips_t = torch.rand(2, n_clips, 5, 3, 12, 12)
    ids = torch.randint(0, 120, (2, text_len))
    mask = torch.ones(2, text_len, dtype=torch.long)
    types = torch.zeros(2, text_len, dtype=torch.long)
    with torch.no_grad():
        ref = oracle(clips_t, ids, mask, types).numpy()

    sd = build_reference_named_state_dict(oracle)
    # structure is auto-inferred from keys
    assert tio.infer_e2e_structure(sd) == ((2, 2), 2, 2)
    params = tio.convert_e2e(sd)

    bert_cfg = B.BertConfig(vocab_size=120, hidden_size=dim, num_layers=2,
                            num_heads=4, intermediate_size=96,
                            max_position_embeddings=32, type_vocab_size=2,
                            hidden_dropout=0.0, attention_dropout=0.0)
    cfg = E.E2EConfig(feature_dim=dim, num_classes=n_cls, drop_out_rate=0.0,
                      video_feature_res=(3, 3), video_feature_dim=32,
                      frame_sample_size=5, temporal_scale=(2,),
                      text_seq_len=text_len, task_type="oe", bert=bert_cfg,
                      swin=swin_cfg)

    clips_jax = jnp.asarray(clips_t.permute(0, 1, 2, 4, 5, 3).numpy())
    got = E.e2e_forward(params, clips_jax, jnp.asarray(ids.numpy()),
                        jnp.asarray(mask.numpy()), jnp.asarray(types.numpy()),
                        cfg)
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)
