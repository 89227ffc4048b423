"""Mixed-precision policy tests (apex L1 cross-product analogue):
bf16 compute must track f32 within bf16 tolerance, params stay f32, and the
RoBERTa text variant's position offset is honoured."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volta_tpu import zoo
from volta_tpu.models import VoltaModel

from test_model_shapes import tiny_zoo, batch, init_model, B, L, K


def test_bf16_tracks_f32():
    cfg = tiny_zoo("ctrl_uniter_base")
    model32 = VoltaModel(cfg)
    args = batch(cfg)
    params = init_model(model32, *args)
    out32, *_ = model32.apply(params, *args)

    cfg16 = tiny_zoo("ctrl_uniter_base")
    cfg16.compute_dtype = "bfloat16"
    model16 = VoltaModel(cfg16)
    out16, *_ = model16.apply(params, *args)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), atol=0.15, rtol=0.1)
    # params are fp32 regardless of the compute dtype
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32


def test_roberta_position_offset():
    """As-shipped, RoBERTa positions are 0-based like BERT's — the
    reference's RobertaEmbeddings computes fairseq offsets but its parent
    forward discards them (volta/embeddings.py:55-57; oracle-verified).
    roberta_position_offset=True opts into the intended scheme."""
    cfg = tiny_zoo("ctrl_vilbert_base")
    cfg.model = "roberta"
    from volta_tpu.models.embeddings import TextEmbeddings

    emb = TextEmbeddings(cfg)
    ids = np.ones((1, 4), np.int32) * 3
    types = np.zeros((1, 4), np.int32)
    params = emb.init(jax.random.PRNGKey(0), ids, types)
    out_roberta, _ = emb.apply(params, ids, types)
    pos = lambda a, b: np.arange(a, b, dtype=np.int32)[None]
    out_bert, _ = emb.apply(params, ids, types, position_ids=pos(0, 4))
    np.testing.assert_allclose(np.asarray(out_roberta),
                               np.asarray(out_bert), rtol=1e-6)

    cfg.roberta_position_offset = True
    out_off, _ = TextEmbeddings(cfg).apply(params, ids, types)
    out_manual, _ = emb.apply(params, ids, types, position_ids=pos(2, 6))
    np.testing.assert_allclose(np.asarray(out_off),
                               np.asarray(out_manual), rtol=1e-6)
