"""Parity test: lrce_tpu BERT vs HuggingFace torch BertModel (random init).

Uses a scaled-down config so the test runs fast; layer math is identical to
bert-base (reference lrce/feature_extractor/text.py:9 wraps the HF model)."""

import numpy as np
import torch

import jax.numpy as jnp

from lrce_tpu.models import bert as B
from lrce_tpu.utils import torch_io as tio

TOL = dict(rtol=2e-4, atol=3e-5)


def _small_cfgs():
    from transformers import BertConfig as HFConfig

    hf = HFConfig(vocab_size=200, hidden_size=48, num_hidden_layers=3,
                  num_attention_heads=4, intermediate_size=96,
                  max_position_embeddings=64, type_vocab_size=2,
                  hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                  hidden_act="gelu")
    mine = B.BertConfig(vocab_size=200, hidden_size=48, num_layers=3,
                        num_heads=4, intermediate_size=96,
                        max_position_embeddings=64, type_vocab_size=2,
                        hidden_dropout=0.0, attention_dropout=0.0)
    return hf, mine


def test_bert_matches_hf():
    from transformers import BertModel

    torch.manual_seed(0)
    hf_cfg, cfg = _small_cfgs()
    model = BertModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = tio.convert_bert(sd, num_layers=cfg.num_layers)

    ids = torch.randint(0, 200, (2, 10))
    mask = torch.ones(2, 10, dtype=torch.long)
    mask[0, 7:] = 0  # padding on first sequence
    type_ids = torch.zeros(2, 10, dtype=torch.long)
    type_ids[1, 5:] = 1

    with torch.no_grad():
        ref = model(input_ids=ids, attention_mask=mask,
                    token_type_ids=type_ids).last_hidden_state.numpy()

    got = B.bert_encode(params, jnp.asarray(ids.numpy()),
                        jnp.asarray(mask.numpy()),
                        jnp.asarray(type_ids.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


def test_bert_pooler_matches_hf():
    from transformers import BertModel

    torch.manual_seed(1)
    hf_cfg, cfg = _small_cfgs()
    model = BertModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = tio.convert_bert(sd, num_layers=cfg.num_layers)

    ids = torch.randint(0, 200, (2, 8))
    with torch.no_grad():
        out = model(input_ids=ids)
        ref = out.pooler_output.numpy()
    hidden = B.bert_encode(params, jnp.asarray(ids.numpy()), cfg=cfg)
    got = B.bert_pool(params, hidden)
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


def test_bert_base_shapes():
    import jax

    params = B.bert_init(jax.random.PRNGKey(0))
    ids = jnp.ones((2, 16), jnp.int32)
    out = B.bert_encode(params, ids)
    assert out.shape == (2, 16, 768)
