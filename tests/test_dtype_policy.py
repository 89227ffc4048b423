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
    cfg = tiny_zoo("ctrl_vilbert_base")
    cfg.model = "roberta"
    from volta_tpu.models.embeddings import TextEmbeddings

    emb = TextEmbeddings(cfg)
    ids = np.ones((1, 4), np.int32) * 3
    types = np.zeros((1, 4), np.int32)
    params = emb.init(jax.random.PRNGKey(0), ids, types)
    out_roberta, _ = emb.apply(params, ids, types)
    # same table consumed with explicit bert-style ids shifted by 2 matches
    out_manual, _ = emb.apply(params, ids, types,
                              position_ids=np.arange(2, 6, dtype=np.int32)
                              [None].repeat(1, 0))
    np.testing.assert_allclose(np.asarray(out_roberta),
                               np.asarray(out_manual), rtol=1e-6)
