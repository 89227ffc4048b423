"""Importer + numerics parity tests.

The text-only path (embeddings -> tt attention -> FF, TF-style LN eps=1e-12,
erf gelu) is compared against the HuggingFace BERT implementation after
importing the same randomly initialised torch state dict through the
BERT-layer -> sublayer remap. This is the strongest available oracle without
network access.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volta_tpu import zoo
from volta_tpu.checkpoint import import_state_dict
from volta_tpu.models import VoltaModel

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

H, HEADS, INTER, VOCAB, LAYERS = 32, 4, 64, 50, 2
B, L, K = 2, 10, 5


def make_hf_bert():
    cfg = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12)
    torch.manual_seed(0)
    return transformers.BertModel(cfg).eval()


def my_text_only_cfg():
    # text-only trunk: tt attention + t-ff, no vision sublayers
    cfg = zoo.vilbert(
        depth_text=LAYERS, cross_start=LAYERS, hidden_size=H,
        num_attention_heads=HEADS, intermediate_size=INTER, vocab_size=VOCAB,
        max_position_embeddings=40, v_feature_size=16, v_hidden_size=H,
        v_num_attention_heads=HEADS, v_intermediate_size=INTER,
        pooler_size=H, v_pooler_size=H, use_pallas=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0)
    return cfg


def test_hf_bert_text_parity():
    hf = make_hf_bert()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = my_text_only_cfg()
    model = VoltaModel(cfg)
    rng = np.random.RandomState(1)
    ids = rng.randint(1, VOCAB, (B, L)).astype(np.int32)
    ids[:, -2:] = 0
    mask = (ids != 0).astype(np.int32)
    types = np.zeros((B, L), np.int32)
    feats = rng.randn(B, K, cfg.v_feature_size).astype(np.float32)
    locs = rng.rand(B, K, cfg.num_locs).astype(np.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids, feats, locs,
                                 types, mask, None)
    params, report = import_state_dict(cfg, params, sd, from_hf=True)
    # all text-side params should have loaded
    loaded = set(report["loaded"])
    for want in ("embeddings.word_embeddings.embedding",
                 "encoder.attn_0.query.kernel",
                 "encoder.ff_1.inter_dense.kernel",
                 f"encoder.attn_{2*LAYERS-2}.out_ln.scale"):
        assert want in loaded, (want, sorted(loaded))

    seq_t, *_ = model.apply(params, ids, feats, locs, types, mask, None)

    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                    attention_mask=torch.tensor(mask.astype(np.int64)),
                    token_type_ids=torch.tensor(types.astype(np.int64)))
    ref = hf_out.last_hidden_state.numpy()
    got = np.asarray(seq_t)
    # compare non-padded positions (mask handling differs at -inf vs -1e4).
    # tolerance covers oneDNN-vs-XLA accumulation-order noise (~1e-4); an
    # actual mis-mapped parameter produces O(1) errors.
    live = mask.astype(bool)
    np.testing.assert_allclose(got[live], ref[live], rtol=5e-3, atol=5e-4)


def test_volta_format_roundtrip_mapping():
    """Synthetic VOLTA-format state dict (reference naming) lands on the
    right leaves for a single-stream model with shared params."""
    cfg = zoo.single_stream(
        "uniter", depth=1, hidden_size=H, num_attention_heads=HEADS,
        intermediate_size=INTER, vocab_size=VOCAB, max_position_embeddings=40,
        v_feature_size=16, v_hidden_size=H, v_num_attention_heads=HEADS,
        v_intermediate_size=INTER, pooler_size=H, v_pooler_size=H,
        use_pallas=False)
    model = VoltaModel(cfg)
    rng = np.random.RandomState(2)
    ids = rng.randint(1, VOCAB, (B, L)).astype(np.int32)
    feats = rng.randn(B, K, 16).astype(np.float32)
    locs = rng.rand(B, K, cfg.num_locs).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids, feats, locs,
                                 np.zeros((B, L), np.int32), None, None)

    qw = rng.randn(H, H).astype(np.float32)
    lnw = rng.randn(H).astype(np.float32)
    featw = rng.randn(H, 16).astype(np.float32)
    sd = {
        "bert.encoder.layer.0.attention_self.query.weight": qw,
        "bert.encoder.layer.0.attention_output.LayerNorm.gamma": lnw,
        "bert.embeddings.image_embeddings.weight": featw,
        "bert.embeddings.v_LayerNorm.weight": lnw * 2,
    }
    # gamma/beta renames happen in load_torch_state_dict; emulate here
    sd = {k.replace(".gamma", ".weight"): v for k, v in sd.items()}
    new, report = import_state_dict(cfg, params, sd)
    p = new["params"]
    np.testing.assert_allclose(p["encoder"]["attn_0"]["query"]["kernel"], qw.T)
    np.testing.assert_allclose(p["encoder"]["attn_0"]["out_ln"]["scale"], lnw)
    np.testing.assert_allclose(p["embeddings"]["feat_dense"]["kernel"], featw.T)
    np.testing.assert_allclose(p["embeddings"]["v_layer_norm"]["scale"], lnw * 2)
    assert not report["unused"]


def test_token_type_resize():
    cfg = my_text_only_cfg()
    cfg.type_vocab_size = 3
    model = VoltaModel(cfg)
    rng = np.random.RandomState(3)
    ids = rng.randint(1, VOCAB, (B, L)).astype(np.int32)
    feats = rng.randn(B, K, cfg.v_feature_size).astype(np.float32)
    locs = rng.rand(B, K, cfg.num_locs).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids, feats, locs,
                                 np.zeros((B, L), np.int32), None, None)
    two_rows = rng.randn(2, H).astype(np.float32)
    sd = {"embeddings.token_type_embeddings.weight": two_rows}
    new, _ = import_state_dict(cfg, params, sd)
    got = np.asarray(new["params"]["embeddings"]["token_type_embeddings"]
                     ["embedding"])
    np.testing.assert_allclose(got[:2], two_rows)
    assert got.shape[0] == 3
