"""End-to-end LRCE models: BERT text encoder + Swin-B video encoder + fusion.

TPU-first redesign of the reference E2E composition (reference
lrce/models/e2e.py:7-106, lrce/feature_extractor/{text,video}.py):

  - VideoExtractor: instead of a Python loop over clips
    (reference video.py:32-41), all clips fold into the batch axis and run
    through Swin *once* — a single large MXU-friendly batch.
  - ImageNet normalization is fused into the jitted graph (no host transform).
  - Everything is one jittable pure function over a params pytree; the
    multiple-choice variant flattens (B, 5, L) QA pairs into the batch for
    BERT exactly like the reference (e2e.py:77-81).

Param pytree layout mirrors the reference module names
(fusion_model / text_extractor / video_extractor) so optimizer param-group
labeling (agent_base.py:27-44) and checkpoint conversion stay 1:1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from lrce_tpu.constants import IMAGENET_MEAN, IMAGENET_STD
from lrce_tpu.models import bert as B
from lrce_tpu.models import fusion as F
from lrce_tpu.models import swin3d as S


class E2EConfig(NamedTuple):
    feature_dim: int = 768
    num_classes: int = 1000
    drop_out_rate: float = 0.1
    video_feature_res: tuple = (7, 7)
    video_feature_dim: int = 1024
    frame_sample_size: int = 5
    temporal_scale: tuple = (3,)
    text_seq_len: int = 30
    task_type: str = "oe"  # oe | mc | count
    bert: B.BertConfig = B.BERT_BASE
    swin: S.SwinConfig = S.SWIN_BASE


def e2e_init_jit(rng, cfg: E2EConfig, dtype=jnp.float32) -> dict:
    """e2e_init compiled into ONE device program.

    Plain e2e_init dispatches hundreds of small init kernels, which is
    minutes of round-trips on a remote-tunneled TPU; jitting fuses them.
    """
    return jax.jit(e2e_init, static_argnums=(1, 2))(rng, cfg, dtype)


def e2e_init(rng, cfg: E2EConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    if cfg.task_type == "oe":
        head = F.lrce_open_ended_init(
            k1, cfg.feature_dim, cfg.num_classes, cfg.video_feature_res,
            cfg.video_feature_dim, cfg.frame_sample_size,
            list(cfg.temporal_scale), cfg.text_seq_len, dtype)
    elif cfg.task_type == "mc":
        head = F.lrce_multiple_choice_init(
            k1, cfg.feature_dim, cfg.num_classes, cfg.video_feature_res,
            cfg.video_feature_dim, cfg.frame_sample_size,
            list(cfg.temporal_scale), cfg.text_seq_len, dtype)
    elif cfg.task_type == "count":
        head = F.lrce_count_init(
            k1, cfg.feature_dim, cfg.video_feature_res, cfg.video_feature_dim,
            cfg.frame_sample_size, list(cfg.temporal_scale), cfg.text_seq_len,
            dtype)
    else:
        raise ValueError(f"Unsupported task type {cfg.task_type}")
    return {
        "fusion_model": head,
        "text_extractor": B.bert_init(k2, cfg.bert, dtype),
        "video_extractor": S.swin_init(k3, cfg.swin, dtype),
    }


def extract_video_features(params: dict, video_clips: jnp.ndarray,
                           cfg: E2EConfig, *, deterministic: bool = True,
                           rng: Optional[jax.Array] = None,
                           compute_dtype=jnp.float32,
                           mesh=None) -> jnp.ndarray:
    """(B, n_clips, T, H, W, 3) channels-last uint8/float clips ->
    (B, n_clips, ceil(T/2), H/32 * W/32, 1024).

    Normalization + Swin on all clips batched together (vs the reference's
    per-clip Python loop, video.py:28-43). With a >1-device mesh, the Swin
    tower runs under jax.shard_map over the batch axes so the Pallas
    kernels receive per-shard operands with no GSPMD repartitioning
    (lrce_tpu/parallel/swin_shard.py).
    """
    b, n_clips, t, h, w, c = video_clips.shape
    if video_clips.dtype == jnp.uint8:
        # uint8 transfer path (--uint8-transfer): the host ships raw bytes
        # (4x less host->device bandwidth) and the [0,1] scaling runs here.
        # f32 division keeps this BYTE-EXACT with the host float path
        # (uint8 -> f32 is exact; IEEE f32 division matches numpy's).
        video_clips = video_clips.astype(jnp.float32) / 255.0
    x = video_clips.astype(compute_dtype)
    mean = jnp.asarray(IMAGENET_MEAN, compute_dtype)
    std = jnp.asarray(IMAGENET_STD, compute_dtype)
    x = (x - mean) / std

    x = x.reshape(b * n_clips, t, h, w, c)
    from lrce_tpu.parallel.swin_shard import swin_forward_sharded

    feats = swin_forward_sharded(params, x, cfg.swin, mesh=mesh,
                                 deterministic=deterministic,
                                 rng=rng)  # (b*S, T', h', w', 1024)
    _, tp, hp, wp, cdim = feats.shape
    return feats.reshape(b, n_clips, tp, hp * wp, cdim)


def extract_text_features(params: dict, texts: jnp.ndarray,
                          attention_mask: jnp.ndarray,
                          token_type_ids: jnp.ndarray, cfg: E2EConfig, *,
                          deterministic: bool = True,
                          rng: Optional[jax.Array] = None,
                          compute_dtype=jnp.float32, mesh=None) -> jnp.ndarray:
    """(B, L) or (B, total_mc, L) token ids -> last hidden states.

    MC inputs flatten choices into the batch (reference e2e.py:77-81)."""
    if texts.ndim == 3:
        b, m, l = texts.shape
        out = B.bert_encode(params, texts.reshape(b * m, l),
                            attention_mask.reshape(b * m, l),
                            token_type_ids.reshape(b * m, l), cfg.bert,
                            deterministic=deterministic, rng=rng,
                            compute_dtype=compute_dtype, mesh=mesh)
        return out.reshape(b, m, l, -1)
    return B.bert_encode(params, texts, attention_mask, token_type_ids,
                         cfg.bert, deterministic=deterministic, rng=rng,
                         compute_dtype=compute_dtype, mesh=mesh)


def e2e_forward(params: dict, video_clips: jnp.ndarray, texts: jnp.ndarray,
                texts_attention_mask: jnp.ndarray,
                texts_type_ids: jnp.ndarray, cfg: E2EConfig, *,
                deterministic: bool = True, rng: Optional[jax.Array] = None,
                compute_dtype=jnp.float32, mesh=None) -> jnp.ndarray:
    """Full forward: clips + question tokens -> task logits.

    Output: (B, num_classes) for oe, (B, 5) for mc, (B,) for count.
    mesh: optional jax.sharding.Mesh — routes the Swin tower through
    shard_map over the batch axes (see extract_video_features).
    """
    if video_clips.ndim != 6:
        raise ValueError(
            f"video_clips must be (B, n_clips, T, H, W, 3); got shape "
            f"{video_clips.shape}")
    if video_clips.shape[1] != sum(cfg.temporal_scale):
        raise ValueError(
            f"video_clips has {video_clips.shape[1]} clips but "
            f"temporal_scale={cfg.temporal_scale} implies "
            f"{sum(cfg.temporal_scale)}")
    expected_text_ndim = 3 if cfg.task_type == "mc" else 2
    if texts.ndim != expected_text_ndim:
        raise ValueError(
            f"texts must have ndim {expected_text_ndim} for task "
            f"'{cfg.task_type}'; got shape {texts.shape}")

    r_vid, r_txt, r_fuse = (jax.random.split(rng, 3) if rng is not None
                            else (None, None, None))
    video_features = extract_video_features(
        params["video_extractor"], video_clips, cfg,
        deterministic=deterministic, rng=r_vid, compute_dtype=compute_dtype,
        mesh=mesh)
    text_features = extract_text_features(
        params["text_extractor"], texts, texts_attention_mask, texts_type_ids,
        cfg, deterministic=deterministic, rng=r_txt,
        compute_dtype=compute_dtype, mesh=mesh)

    head = params["fusion_model"]
    kw = dict(dropout_rate=cfg.drop_out_rate, deterministic=deterministic,
              rng=r_fuse, mesh=mesh)
    if cfg.task_type == "oe":
        return F.lrce_open_ended(head, video_features, text_features,
                                 texts_attention_mask, **kw)
    if cfg.task_type == "mc":
        return F.lrce_multiple_choice(head, video_features, text_features,
                                      texts_attention_mask, **kw)
    if cfg.task_type == "count":
        return F.lrce_count(head, video_features, text_features,
                            texts_attention_mask, **kw)
    raise ValueError(cfg.task_type)


def config_from_args(args) -> E2EConfig:
    """Build an E2EConfig from a parsed args namespace (lrce_tpu.config).

    Test hook: LRCE_TPU_TINY_MODEL=1 swaps in scaled-down Swin/BERT encoders
    (same code paths, same 224x224 -> (7,7) geometry) so the full CLI can be
    smoke-tested end-to-end without the 200M-param flagship.
    """
    import os

    if os.environ.get("LRCE_TPU_TINY_MODEL"):
        swin = S.SwinConfig(patch_size=(2, 4, 4), embed_dim=8,
                            depths=(2, 2, 2, 2), num_heads=(2, 2, 2, 2),
                            window_size=(8, 7, 7), drop_path_rate=0.0,
                            patch_norm=True)
        # feature_dim must divide the fusion's 12 heads -> 36
        bert = B.BertConfig(hidden_size=36, num_layers=2, num_heads=2,
                            intermediate_size=72)
        return E2EConfig(
            feature_dim=36, num_classes=args.num_classes,
            drop_out_rate=getattr(args, "drop_out_rate", 0.1),
            video_feature_res=tuple(args.video_feature_res),
            video_feature_dim=64,
            frame_sample_size=args.frame_sample_size,
            temporal_scale=tuple(args.temporal_scale),
            text_seq_len=args.text_seq_len, task_type=args.task_type,
            bert=bert, swin=swin)

    # LRCE_TPU_SWIN_REMAT=1 rematerializes Swin block pairs under autodiff:
    # unlocks per-chip train batches >8 on 16G HBM (see PERF.md).
    swin = S.SWIN_BASE._replace(remat=bool(os.environ.get("LRCE_TPU_SWIN_REMAT")))
    return E2EConfig(
        feature_dim=args.feature_dim,
        num_classes=args.num_classes,
        drop_out_rate=getattr(args, "drop_out_rate", 0.1),
        video_feature_res=tuple(args.video_feature_res),
        video_feature_dim=args.video_feature_dim,
        frame_sample_size=args.frame_sample_size,
        temporal_scale=tuple(args.temporal_scale),
        text_seq_len=args.text_seq_len,
        task_type=args.task_type,
        swin=swin,
    )
