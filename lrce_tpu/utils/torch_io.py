"""Torch state-dict -> JAX pytree converters.

Used for two things:
  1. Ingesting the reference's pretrained checkpoints (.pt/.pth) for
     accuracy-parity evaluation (reference lrce/agent/agent_base.py:194-217,
     lrce/feature_extractor/video.py:20-26).
  2. Golden parity tests: transplant random torch weights into the JAX models
     and compare outputs.

All converters take a flat {name: np.ndarray} dict (use `load_torch_state_dict`
to read a file) and return nested pytrees matching the lrce_tpu param layout.
Torch Linear stores (out, in); our dense layout is (in, out), hence the
transposes.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


def load_torch_state_dict(path: str) -> StateDict:
    """Read a torch checkpoint file into numpy arrays (torch CPU required)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("model_state_dict", "state_dict", "model"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}


def strip_prefix(sd: StateDict, prefix: str) -> StateDict:
    """Keep entries under `prefix` and strip it (e.g. 'backbone.' for the Swin
    Kinetics checkpoint, reference video_swin_ori.py:709-715)."""
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def _t(x: Array) -> Array:
    return np.ascontiguousarray(x.T)


def convert_dense(sd: StateDict, prefix: str, bias: bool = True) -> dict:
    p = {"w": _t(sd[f"{prefix}.weight"])}
    if bias:
        p["b"] = sd[f"{prefix}.bias"]
    return p


def convert_layer_norm(sd: StateDict, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def convert_mha(sd: StateDict, prefix: str) -> dict:
    """torch.nn.MultiheadAttention with packed in_proj."""
    return {
        "in_w": _t(sd[f"{prefix}.in_proj_weight"]),
        "in_b": sd[f"{prefix}.in_proj_bias"],
        "out": convert_dense(sd, f"{prefix}.out_proj"),
    }


def _stack(trees: List[dict]) -> dict:
    """Stack identically-structured numpy pytrees along a new axis 0."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)


def convert_decoder_layer(sd: StateDict, prefix: str) -> dict:
    return {
        "self_attn": convert_mha(sd, f"{prefix}.self_attn"),
        "multihead_attn": convert_mha(sd, f"{prefix}.multihead_attn"),
        "linear1": convert_dense(sd, f"{prefix}.linear1"),
        "linear2": convert_dense(sd, f"{prefix}.linear2"),
        "norm1": convert_layer_norm(sd, f"{prefix}.norm1"),
        "norm2": convert_layer_norm(sd, f"{prefix}.norm2"),
        "norm3": convert_layer_norm(sd, f"{prefix}.norm3"),
    }


def convert_fusion_transformer(sd: StateDict, prefix: str = "",
                               num_layers: int = 12) -> dict:
    """FusionTransformer params (reference lrce/models/fusionv3.py:5-25):
    `transformer.layers.{i}.*` + fusion_layer_norm + summarization_token."""
    pre = f"{prefix}." if prefix else ""
    layers = [convert_decoder_layer(sd, f"{pre}transformer.layers.{i}")
              for i in range(num_layers)]
    return {
        "layers": _stack(layers),
        "fusion_layer_norm": convert_layer_norm(sd, f"{pre}fusion_layer_norm"),
        "summarization_token": sd[f"{pre}summarization_token"],
    }


def convert_text_pos_embed(sd: StateDict, prefix: str) -> dict:
    return {
        "emb_cls": sd[f"{prefix}.emb_cls"],
        "emb_pos": sd[f"{prefix}.emb_pos"],
        "layer_norm": convert_layer_norm(sd, f"{prefix}.layer_norm"),
    }


def convert_video_pos_embed(sd: StateDict, prefix: str) -> dict:
    return {
        "emb_cls": sd[f"{prefix}.emb_cls"],
        "emb_pos": sd[f"{prefix}.emb_pos"],
        "emb_len": sd[f"{prefix}.emb_len"],
        "emb_clip": sd[f"{prefix}.emb_clip"],
        "layer_norm": convert_layer_norm(sd, f"{prefix}.layer_norm"),
    }


def inflate_swin2d(sd: StateDict, window_size=(8, 7, 7),
                   patch_size_d: int = 2) -> StateDict:
    """Inflate a 2D Swin state dict to the 3D layout (capability parity with
    reference video_swin_ori.py:587-639):

      - drop relative_position_index / attn_mask buffers (re-derived),
      - patch_embed conv (O, I, H, W) -> (O, I, D, H, W) / D,
      - bicubic-resize each relative_position_bias_table to the 3D window's
        spatial extent, then tile along the temporal axis (2*wd - 1 copies).

    Returns a 3D-layout state dict consumable by convert_swin.
    """
    import torch
    import torch.nn.functional as TF

    out: StateDict = {}
    wd, wh, ww = window_size
    l2 = (2 * wh - 1) * (2 * ww - 1)
    for k, v in sd.items():
        if "relative_position_index" in k or "attn_mask" in k:
            continue
        if k == "patch_embed.proj.weight" and v.ndim == 4:
            v = np.repeat(v[:, :, None], patch_size_d, axis=2) / patch_size_d
        elif "relative_position_bias_table" in k:
            l1, nh = v.shape
            if l1 != l2:
                s1 = int(round(l1 ** 0.5))
                t = torch.from_numpy(np.ascontiguousarray(v))
                t = t.permute(1, 0).view(1, nh, s1, s1)
                t = TF.interpolate(t, size=(2 * wh - 1, 2 * ww - 1),
                                   mode="bicubic")
                v = t.view(nh, l2).permute(1, 0).numpy()
            v = np.tile(v, (2 * wd - 1, 1))
        out[k] = v
    return out


def _count_indexed(sd: StateDict, pattern: str) -> int:
    """Count consecutive indices i for which pattern.format(i) names a key."""
    i = 0
    while pattern.format(i) in sd:
        i += 1
    return i


def infer_e2e_structure(sd: StateDict):
    """Infer (swin depths, bert layer count, fusion layer count) from a
    reference-named state dict, so checkpoints of any scale convert."""
    n_stages = _count_indexed(
        sd, "video_extractor.swin.layers.{}.blocks.0.norm1.weight")
    depths = tuple(
        _count_indexed(
            sd, "video_extractor.swin.layers.%d.blocks.{}.norm1.weight" % s)
        for s in range(n_stages))
    bert_layers = _count_indexed(
        sd, "text_extractor.bert.encoder.layer.{}.output.dense.weight")
    fusion_layers = _count_indexed(
        sd, "fusion_model.fusion_transformer.transformer.layers.{}.norm1.weight")
    return depths, bert_layers, fusion_layers


def convert_e2e(sd: StateDict, depths=None, bert_layers: int = None,
                fusion_layers: int = None) -> dict:
    """Full reference E2E checkpoint -> lrce_tpu params.

    Reference module tree (lrce/models/e2e.py:7-25): fusion_model.* /
    text_extractor.bert.* / video_extractor.swin.*. Structure (stage depths,
    layer counts) is inferred from the keys unless given explicitly.
    """
    inf_depths, inf_bert, inf_fusion = infer_e2e_structure(sd)
    depths = depths if depths is not None else (inf_depths or (2, 2, 18, 2))
    bert_layers = bert_layers if bert_layers is not None else (inf_bert or 12)
    fusion_layers = (fusion_layers if fusion_layers is not None
                     else (inf_fusion or 12))
    head = {
        "video_pos_embed": convert_video_pos_embed(
            sd, "fusion_model.video_pos_embed"),
        "question_pos_embed": convert_text_pos_embed(
            sd, "fusion_model.question_pos_embed"),
        "fusion_transformer": convert_fusion_transformer(
            sd, "fusion_model.fusion_transformer", num_layers=fusion_layers),
        "final_fc": convert_dense(sd, "fusion_model.final_fc"),
    }
    if "fusion_model.projection_layer.weight" in sd:
        head["projection_layer"] = convert_dense(sd, "fusion_model.projection_layer")
    return {
        "fusion_model": head,
        "text_extractor": convert_bert(sd, "text_extractor",
                                       num_layers=bert_layers),
        "video_extractor": convert_swin(sd, "video_extractor.swin",
                                        depths=depths),
    }


def convert_swin(sd: StateDict, prefix: str = "",
                 depths=(2, 2, 18, 2), patch_norm: bool = True) -> dict:
    """Video Swin Transformer 3D state dict -> lrce_tpu swin params.

    Key layout follows the public Video-Swin checkpoints (after stripping the
    'backbone.' prefix, reference video_swin_ori.py:709-715):
    patch_embed.proj/norm, layers.{i}.blocks.{j}.{norm1,attn,norm2,mlp},
    layers.{i}.downsample.{norm,reduction}, norm.
    Conv kernels go OIDHW -> DHWIO; linear weights transpose.
    """
    pre = f"{prefix}." if prefix else ""

    def block(i: int, j: int) -> dict:
        bp = f"{pre}layers.{i}.blocks.{j}"
        return {
            "norm1": convert_layer_norm(sd, f"{bp}.norm1"),
            "attn": {
                "qkv": convert_dense(sd, f"{bp}.attn.qkv"),
                "proj": convert_dense(sd, f"{bp}.attn.proj"),
                "rel_table": sd[f"{bp}.attn.relative_position_bias_table"],
            },
            "norm2": convert_layer_norm(sd, f"{bp}.norm2"),
            "mlp": {
                "fc1": convert_dense(sd, f"{bp}.mlp.fc1"),
                "fc2": convert_dense(sd, f"{bp}.mlp.fc2"),
            },
        }

    params = {
        "patch_embed": {
            "proj": {
                "w": np.ascontiguousarray(
                    sd[f"{pre}patch_embed.proj.weight"].transpose(2, 3, 4, 1, 0)),
                "b": sd[f"{pre}patch_embed.proj.bias"],
            },
        },
        "stages": [],
        "norm": convert_layer_norm(sd, f"{pre}norm"),
    }
    if patch_norm and f"{pre}patch_embed.norm.weight" in sd:
        params["patch_embed"]["norm"] = convert_layer_norm(sd, f"{pre}patch_embed.norm")

    for i, depth in enumerate(depths):
        stage = {"blocks": _stack([block(i, j) for j in range(depth)])}
        if f"{pre}layers.{i}.downsample.reduction.weight" in sd:
            stage["downsample"] = {
                "norm": convert_layer_norm(sd, f"{pre}layers.{i}.downsample.norm"),
                "reduction": convert_dense(
                    sd, f"{pre}layers.{i}.downsample.reduction", bias=False),
            }
        params["stages"].append(stage)
    return params


def convert_bert(sd: StateDict, prefix: str = "", num_layers: int = 12,
                 with_pooler: bool = True) -> dict:
    """HuggingFace BertModel state dict -> lrce_tpu bert params.

    Accepts either `bert.encoder.layer.{i}...` (as in the reference E2E
    checkpoint under text_extractor.bert.*) or bare `encoder.layer.{i}...`.
    """
    pre = f"{prefix}." if prefix else ""
    if f"{pre}embeddings.word_embeddings.weight" not in sd and \
            f"{pre}bert.embeddings.word_embeddings.weight" in sd:
        pre = f"{pre}bert."

    def layer(i: int) -> dict:
        lp = f"{pre}encoder.layer.{i}"
        return {
            "attention": {
                "query": convert_dense(sd, f"{lp}.attention.self.query"),
                "key": convert_dense(sd, f"{lp}.attention.self.key"),
                "value": convert_dense(sd, f"{lp}.attention.self.value"),
                "output": convert_dense(sd, f"{lp}.attention.output.dense"),
                "output_layer_norm": convert_layer_norm(
                    sd, f"{lp}.attention.output.LayerNorm"),
            },
            "intermediate": convert_dense(sd, f"{lp}.intermediate.dense"),
            "output": convert_dense(sd, f"{lp}.output.dense"),
            "output_layer_norm": convert_layer_norm(sd, f"{lp}.output.LayerNorm"),
        }

    params = {
        "embeddings": {
            "word": sd[f"{pre}embeddings.word_embeddings.weight"],
            "position": sd[f"{pre}embeddings.position_embeddings.weight"],
            "token_type": sd[f"{pre}embeddings.token_type_embeddings.weight"],
            "layer_norm": convert_layer_norm(sd, f"{pre}embeddings.LayerNorm"),
        },
        "layers": _stack([layer(i) for i in range(num_layers)]),
    }
    if with_pooler and f"{pre}pooler.dense.weight" in sd:
        params["pooler"] = convert_dense(sd, f"{pre}pooler.dense")
    return params


def convert_lrce_head(sd: StateDict, prefix: str = "") -> dict:
    """LRCE{OpenEnded,MultipleChoice,Count} head params
    (reference lrce/models/fusionv3.py:129-198)."""
    pre = f"{prefix}." if prefix else ""
    params = {
        "video_pos_embed": convert_video_pos_embed(sd, f"{pre}video_pos_embed"),
        "question_pos_embed": convert_text_pos_embed(sd, f"{pre}question_pos_embed"),
        "fusion_transformer": convert_fusion_transformer(sd, f"{pre}fusion_transformer"),
        "final_fc": convert_dense(sd, f"{pre}final_fc"),
    }
    if f"{pre}projection_layer.weight" in sd:
        params["projection_layer"] = convert_dense(sd, f"{pre}projection_layer")
    return params
