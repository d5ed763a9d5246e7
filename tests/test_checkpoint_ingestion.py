"""Golden end-to-end checkpoint-ingestion test.

Assembles a torch state dict with the EXACT reference module naming
(fusion_model.* / text_extractor.bert.* / video_extractor.swin.*, reference
lrce/models/e2e.py:7-25) from torch oracles (HF BertModel, the read-only
reference SwinTransformer3D, torch TransformerDecoder), converts it with
convert_e2e, and verifies that the JAX e2e_forward reproduces the chained
torch computation — the full reference forward (e2e.py:22-25,
video.py:28-43, fusionv3.py:168-198) — on the same inputs."""

import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from lrce_tpu.models import bert as B
from lrce_tpu.models import e2e as E
from lrce_tpu.models import swin3d as S
from lrce_tpu.utils import torch_io as tio

from test_swin_parity import _load_reference_swin  # noqa: E402
from test_fusion_parity import make_torch_decoder  # noqa: E402

TOL = dict(rtol=5e-4, atol=5e-4)

FEATURE_DIM = 48
NUM_CLASSES = 13
VIDEO_DIM = 32  # swin output dim = embed 16 * 2^(stages-1)
TEXT_LEN = 7
N_CLIPS = 2  # temporal_scale (2,)
FUSION_LAYERS = 2
FUSION_HEADS = 12  # matches production head count; 48 % 12 == 0


class TorchE2EOracle(tnn.Module):
    """Reference-equivalent E2E composition from torch primitives."""

    def __init__(self, swin_oracle, hf_bert):
        super().__init__()
        self.swin = swin_oracle
        self.bert = hf_bert
        dim = FEATURE_DIM
        self.projection_layer = tnn.Linear(VIDEO_DIM, dim)
        # video pos embed factors (reference embedding.py:26-63)
        t, hw = 3, 9  # swin output: D'=3, 3x3 spatial
        self.v_cls = tnn.Parameter(torch.randn(1, 1, 1, 1, dim))
        self.v_pos = tnn.Parameter(torch.randn(1, 1, 1, 1 + hw, dim))
        self.v_len = tnn.Parameter(torch.randn(1, 1, t, 1, dim))
        self.v_clip = tnn.Parameter(torch.randn(1, N_CLIPS, 1, 1, dim))
        self.v_ln = tnn.LayerNorm(dim, eps=1e-12)
        self.q_cls = tnn.Parameter(torch.randn(1, 1, dim))
        self.q_pos = tnn.Parameter(torch.randn(1, 1 + TEXT_LEN, dim))
        self.q_ln = tnn.LayerNorm(dim, eps=1e-12)
        self.transformer = make_torch_decoder(dim, FUSION_HEADS, 96,
                                              FUSION_LAYERS)
        self.fusion_layer_norm = tnn.LayerNorm(dim, eps=1e-12)
        self.summarization_token = tnn.Parameter(torch.randn(1, 1, dim))
        self.final_fc = tnn.Linear(dim, NUM_CLASSES)

    def forward(self, clips, ids, mask, types):
        # clips: (B, n_clips, T, C, H, W) torch layout
        b, n_clips, t, c, h, w = clips.shape
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1, 1)
        feats = []
        for i in range(n_clips):
            clip = clips[:, i].transpose(1, 2)  # (B, C, T, H, W)
            clip = (clip - mean) / std
            f = self.swin(clip)  # (B, C', D', H', W')
            bq, cd, dp, hp, wp = f.shape
            f = f.permute(0, 2, 3, 4, 1).reshape(bq, dp, hp * wp, cd)
            feats.append(f)
        video = torch.stack(feats, dim=1)  # (B, S, T', HW, VIDEO_DIM)

        text = self.bert(input_ids=ids, attention_mask=mask,
                         token_type_ids=types).last_hidden_state

        video = self.projection_layer(video)
        bb, sс, tt, hw, _ = video.shape
        video = torch.cat([self.v_cls.expand(bb, sс, tt, -1, -1), video], 3)
        video = video + self.v_pos.expand(bb, sс, tt, -1, -1)
        video = video + self.v_len.expand(bb, sс, -1, 1 + hw, -1)
        video = video + self.v_clip.expand(bb, -1, tt, 1 + hw, -1)
        video = self.v_ln(video).view(bb, sс, tt * (1 + hw), -1)

        text = torch.cat([self.q_cls.expand(bb, -1, -1), text], 1)
        text = self.q_ln(text + self.q_pos.expand(bb, -1, -1))

        token = self.summarization_token.expand(bb, -1, -1)
        for i in range(sс):
            mem = torch.cat([video[:, i], text], dim=1)
            token = self.fusion_layer_norm(token + self.transformer(token, mem))
        return self.final_fc(token.squeeze(1))


def build_reference_named_state_dict(oracle):
    """Flatten the oracle into the reference's checkpoint key scheme."""
    sd = {}
    for k, v in oracle.swin.state_dict().items():
        if "relative_position_index" not in k:
            sd[f"video_extractor.swin.{k}"] = v.detach().numpy()
    for k, v in oracle.bert.state_dict().items():
        sd[f"text_extractor.bert.{k}"] = v.detach().numpy()
    fm = "fusion_model"
    sd[f"{fm}.projection_layer.weight"] = oracle.projection_layer.weight.detach().numpy()
    sd[f"{fm}.projection_layer.bias"] = oracle.projection_layer.bias.detach().numpy()
    sd[f"{fm}.video_pos_embed.emb_cls"] = oracle.v_cls.detach().numpy()
    sd[f"{fm}.video_pos_embed.emb_pos"] = oracle.v_pos.detach().numpy()
    sd[f"{fm}.video_pos_embed.emb_len"] = oracle.v_len.detach().numpy()
    sd[f"{fm}.video_pos_embed.emb_clip"] = oracle.v_clip.detach().numpy()
    sd[f"{fm}.video_pos_embed.layer_norm.weight"] = oracle.v_ln.weight.detach().numpy()
    sd[f"{fm}.video_pos_embed.layer_norm.bias"] = oracle.v_ln.bias.detach().numpy()
    sd[f"{fm}.question_pos_embed.emb_cls"] = oracle.q_cls.detach().numpy()
    sd[f"{fm}.question_pos_embed.emb_pos"] = oracle.q_pos.detach().numpy()
    sd[f"{fm}.question_pos_embed.layer_norm.weight"] = oracle.q_ln.weight.detach().numpy()
    sd[f"{fm}.question_pos_embed.layer_norm.bias"] = oracle.q_ln.bias.detach().numpy()
    ft = f"{fm}.fusion_transformer"
    for k, v in oracle.transformer.state_dict().items():
        sd[f"{ft}.transformer.{k}"] = v.detach().numpy()
    sd[f"{ft}.fusion_layer_norm.weight"] = oracle.fusion_layer_norm.weight.detach().numpy()
    sd[f"{ft}.fusion_layer_norm.bias"] = oracle.fusion_layer_norm.bias.detach().numpy()
    sd[f"{ft}.summarization_token"] = oracle.summarization_token.detach().numpy()
    sd[f"{fm}.final_fc.weight"] = oracle.final_fc.weight.detach().numpy()
    sd[f"{fm}.final_fc.bias"] = oracle.final_fc.bias.detach().numpy()
    return sd


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

    hf = BertModel(HFConfig(
        vocab_size=120, hidden_size=FEATURE_DIM, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu"))

    oracle = TorchE2EOracle(swin, hf)
    oracle.eval()

    # torch-side reference forward
    clips_t = torch.rand(2, N_CLIPS, 5, 3, 12, 12)
    ids = torch.randint(0, 120, (2, TEXT_LEN))
    mask = torch.ones(2, TEXT_LEN, dtype=torch.long)
    types = torch.zeros(2, TEXT_LEN, dtype=torch.long)
    with torch.no_grad():
        ref = oracle(clips_t, ids, mask, types).numpy()

    # convert the reference-named checkpoint and run the JAX model
    sd = build_reference_named_state_dict(oracle)
    params = tio.convert_e2e(sd, depths=swin_cfg.depths, bert_layers=2,
                             fusion_layers=FUSION_LAYERS)

    bert_cfg = B.BertConfig(vocab_size=120, hidden_size=FEATURE_DIM,
                            num_layers=2, num_heads=4, intermediate_size=96,
                            max_position_embeddings=32, type_vocab_size=2,
                            hidden_dropout=0.0, attention_dropout=0.0)
    cfg = E.E2EConfig(feature_dim=FEATURE_DIM, num_classes=NUM_CLASSES,
                      drop_out_rate=0.0, video_feature_res=(3, 3),
                      video_feature_dim=VIDEO_DIM, frame_sample_size=5,
                      temporal_scale=(2,), text_seq_len=TEXT_LEN,
                      task_type="oe", bert=bert_cfg, swin=swin_cfg)

    clips_jax = jnp.asarray(clips_t.permute(0, 1, 2, 4, 5, 3).numpy())
    got = E.e2e_forward(params, clips_jax, jnp.asarray(ids.numpy()),
                        jnp.asarray(mask.numpy()), jnp.asarray(types.numpy()),
                        cfg)
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)
