"""Shared test utilities: a parameterized torch E2E oracle with the reference
module structure, and a flattener producing reference-named state dicts."""

import torch
import torch.nn as tnn


def make_torch_decoder(dim, nhead, dff, num_layers):
    layer = tnn.TransformerDecoderLayer(
        d_model=dim, nhead=nhead, dropout=0.0, dim_feedforward=dff,
        batch_first=True, layer_norm_eps=1e-12,
        activation=torch.nn.functional.gelu)
    return tnn.TransformerDecoder(layer, num_layers=num_layers)


class TorchE2EOracle(tnn.Module):
    """Reference-equivalent E2E composition (reference lrce/models/e2e.py:7-25,
    video.py:28-43, embedding.py, fusionv3.py:27-51,168-198) from torch
    primitives, for golden checkpoint tests."""

    def __init__(self, swin_oracle, hf_bert, *, feature_dim, video_dim,
                 num_classes, text_len, n_clips, t_prime, hw,
                 fusion_layers=2, fusion_heads=12, fusion_dff=96):
        super().__init__()
        self.swin = swin_oracle
        self.bert = hf_bert
        dim = feature_dim
        self.n_clips = n_clips
        self.projection_layer = tnn.Linear(video_dim, dim)
        self.v_cls = tnn.Parameter(torch.randn(1, 1, 1, 1, dim))
        self.v_pos = tnn.Parameter(torch.randn(1, 1, 1, 1 + hw, dim))
        self.v_len = tnn.Parameter(torch.randn(1, 1, t_prime, 1, dim))
        self.v_clip = tnn.Parameter(torch.randn(1, n_clips, 1, 1, dim))
        self.v_ln = tnn.LayerNorm(dim, eps=1e-12)
        self.q_cls = tnn.Parameter(torch.randn(1, 1, dim))
        self.q_pos = tnn.Parameter(torch.randn(1, 1 + text_len, dim))
        self.q_ln = tnn.LayerNorm(dim, eps=1e-12)
        self.transformer = make_torch_decoder(dim, fusion_heads, fusion_dff,
                                              fusion_layers)
        self.fusion_layer_norm = tnn.LayerNorm(dim, eps=1e-12)
        self.summarization_token = tnn.Parameter(torch.randn(1, 1, dim))
        self.final_fc = tnn.Linear(dim, num_classes)

    def _video_feats(self, clips):
        """clips (B, n_clips, T, C, H, W) -> pos-embedded video tokens
        (B, S, T'*(1+hw), dim) (reference video.py:28-43, embedding.py:26-63,
        fusionv3.py:184-193)."""
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1, 1)
        feats = []
        for i in range(self.n_clips):
            clip = (clips[:, i].transpose(1, 2) - mean) / std
            f = self.swin(clip)  # (B, C', D', H', W')
            bq, cd, dp, hp, wp = f.shape
            feats.append(f.permute(0, 2, 3, 4, 1).reshape(bq, dp, hp * wp, cd))
        video = torch.stack(feats, dim=1)

        video = self.projection_layer(video)
        bb, s, tt, hw, _ = video.shape
        video = torch.cat([self.v_cls.expand(bb, s, tt, -1, -1), video], 3)
        video = video + self.v_pos.expand(bb, s, tt, -1, -1)
        video = video + self.v_len.expand(bb, s, -1, 1 + hw, -1)
        video = video + self.v_clip.expand(bb, -1, tt, 1 + hw, -1)
        return self.v_ln(video).view(bb, s, tt * (1 + hw), -1)

    def _text_feats(self, ids, mask, types):
        """(B', L) token ids -> pos-embedded text tokens (B', 1+L, dim)."""
        text = self.bert(input_ids=ids, attention_mask=mask,
                         token_type_ids=types).last_hidden_state
        bb = text.shape[0]
        text = torch.cat([self.q_cls.expand(bb, -1, -1), text], 1)
        return self.q_ln(text + self.q_pos.expand(bb, -1, -1))

    def _fuse(self, video, text):
        """Recurrent fusion over scales -> summarized token (B', 1, dim)."""
        bb, s = video.shape[0], video.shape[1]
        token = self.summarization_token.expand(bb, -1, -1)
        for i in range(s):
            mem = torch.cat([video[:, i], text], dim=1)
            token = self.fusion_layer_norm(token + self.transformer(token, mem))
        return token

    def forward(self, clips, ids, mask, types):
        video = self._video_feats(clips)
        text = self._text_feats(ids, mask, types)
        token = self._fuse(video, text)
        return self.final_fc(token.squeeze(1))


class TorchE2EMCOracle(TorchE2EOracle):
    """Reference multiple-choice composition (reference lrce/models/e2e.py:
    53-81, fusionv3.py:201-265): the 5 QA pairs flatten (B,5,L)->(B*5,L)
    through BERT and the question pos-embed; the video tokens are
    pos-embedded per ORIGINAL batch row, then expanded x5 before fusion;
    the dim->1 head reshapes to (B, 5) choice logits."""

    def forward(self, clips, ids, mask, types):
        b, total_mc, _ = ids.shape
        video = self._video_feats(clips)              # (B, S, seq, dim)
        text = self._text_feats(ids.flatten(0, 1), mask.flatten(0, 1),
                                types.flatten(0, 1))  # (B*5, 1+L, dim)
        video = video.unsqueeze(1).expand(
            -1, total_mc, -1, -1, -1).flatten(0, 1)   # (B*5, S, seq, dim)
        token = self._fuse(video, text)
        out = self.final_fc(token.squeeze(1))         # (B*5, 1)
        return out.view(b, total_mc)


class TorchE2ECountOracle(TorchE2EOracle):
    """Reference count composition (reference fusionv3.py:336-369): the
    open-ended forward with a forced single-neuron head, ReLU, flattened
    to (B,)."""

    def forward(self, clips, ids, mask, types):
        out = super().forward(clips, ids, mask, types)
        return torch.relu(out.view(clips.shape[0]))


def build_reference_named_state_dict(oracle, numpy=True):
    """Flatten the oracle into the reference checkpoint key scheme."""
    conv = (lambda v: v.detach().numpy()) if numpy else (lambda v: v.detach())
    sd = {}
    for k, v in oracle.swin.state_dict().items():
        if "relative_position_index" not in k:
            sd[f"video_extractor.swin.{k}"] = conv(v)
    for k, v in oracle.bert.state_dict().items():
        sd[f"text_extractor.bert.{k}"] = conv(v)
    fm = "fusion_model"
    pairs = {
        f"{fm}.projection_layer.weight": oracle.projection_layer.weight,
        f"{fm}.projection_layer.bias": oracle.projection_layer.bias,
        f"{fm}.video_pos_embed.emb_cls": oracle.v_cls,
        f"{fm}.video_pos_embed.emb_pos": oracle.v_pos,
        f"{fm}.video_pos_embed.emb_len": oracle.v_len,
        f"{fm}.video_pos_embed.emb_clip": oracle.v_clip,
        f"{fm}.video_pos_embed.layer_norm.weight": oracle.v_ln.weight,
        f"{fm}.video_pos_embed.layer_norm.bias": oracle.v_ln.bias,
        f"{fm}.question_pos_embed.emb_cls": oracle.q_cls,
        f"{fm}.question_pos_embed.emb_pos": oracle.q_pos,
        f"{fm}.question_pos_embed.layer_norm.weight": oracle.q_ln.weight,
        f"{fm}.question_pos_embed.layer_norm.bias": oracle.q_ln.bias,
        f"{fm}.fusion_transformer.fusion_layer_norm.weight":
            oracle.fusion_layer_norm.weight,
        f"{fm}.fusion_transformer.fusion_layer_norm.bias":
            oracle.fusion_layer_norm.bias,
        f"{fm}.fusion_transformer.summarization_token":
            oracle.summarization_token,
        f"{fm}.final_fc.weight": oracle.final_fc.weight,
        f"{fm}.final_fc.bias": oracle.final_fc.bias,
    }
    for k, v in pairs.items():
        sd[k] = conv(v)
    for k, v in oracle.transformer.state_dict().items():
        sd[f"{fm}.fusion_transformer.transformer.{k}"] = conv(v)
    return sd
