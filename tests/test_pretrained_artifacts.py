"""Artifact-gated golden tests: run automatically when the real pretrained
files are present (they are not shipped in this no-egress environment).

Drop the reference artifacts into ./pretrained_models/ and these verify
true checkpoint-output parity against the reference implementation:
  - swin_base_patch244_window877_kinetics600_22k.pth
  - bert-base-uncased.pt (torch state dict of HF BertModel)
"""

import os

import numpy as np
import pytest

SWIN_CKPT = "./pretrained_models/swin_base_patch244_window877_kinetics600_22k.pth"
BERT_CKPT = "./pretrained_models/bert-base-uncased.pt"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(SWIN_CKPT),
                    reason="Kinetics-600 Swin checkpoint not present")
def test_swin_kinetics_checkpoint_parity():
    """Real Swin-B weights: JAX output must match the reference torch
    implementation on the reference's own shape oracle input
    (video_swin_ori.py:695-720: (1,3,11,224,224) -> (1,1024,6,7,7))."""
    import torch

    import jax.numpy as jnp

    from lrce_tpu.models import swin3d as S
    from lrce_tpu.utils import torch_io as tio
    from test_swin_parity import _load_reference_swin

    oracle_mod = _load_reference_swin()
    model = oracle_mod.SwinTransformer3D(
        pretrained=None, pretrained2d=False, patch_size=(2, 4, 4),
        embed_dim=128, depths=[2, 2, 18, 2], num_heads=[4, 8, 16, 32],
        window_size=(8, 7, 7), drop_path_rate=0.2, patch_norm=True)
    sd = tio.load_torch_state_dict(SWIN_CKPT)
    sd = tio.strip_prefix(sd, "backbone.")
    model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    model.eval()

    params = tio.convert_swin(sd)
    x = np.random.RandomState(0).rand(1, 3, 11, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    got = S.swin_forward(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    assert got.shape == ref.shape == (1, 1024, 6, 7, 7)
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(BERT_CKPT),
                    reason="bert-base-uncased weights not present")
def test_bert_pretrained_checkpoint_parity():
    import torch

    import jax.numpy as jnp

    from lrce_tpu.models import bert as B
    from lrce_tpu.utils import torch_io as tio

    sd = tio.load_torch_state_dict(BERT_CKPT)
    params = tio.convert_bert(sd)

    from transformers import BertConfig as HFConfig, BertModel

    model = BertModel(HFConfig())
    model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()
         if not k.startswith("cls.")}, strict=False)
    model.eval()

    ids = torch.randint(0, 30522, (2, 16))
    mask = torch.ones(2, 16, dtype=torch.long)
    with torch.no_grad():
        ref = model(input_ids=ids, attention_mask=mask).last_hidden_state.numpy()
    got = B.bert_encode(params, jnp.asarray(ids.numpy()),
                        jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-4, atol=5e-4)
