import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volta_tpu import zoo
from volta_tpu.models import VoltaModel, VoltaForVLPreTraining, VoltaForVLTasks

B, L, K = 2, 12, 9  # batch, text len, regions (incl. global)

SMALL = dict(
    hidden_size=48, num_attention_heads=4, intermediate_size=64,
    pooler_size=48, v_pooler_size=48, vocab_size=100,
    max_position_embeddings=64, v_feature_size=32, v_hidden_size=48,
    v_num_attention_heads=4, v_intermediate_size=64, clf_hidden_size=32,
    use_pallas=False,
)


def tiny_zoo(name):
    """Shallow version of each zoo pattern: same gating structure
    (single-stream/dual-stream/cross blocks, sharing, single-LN), small dims
    and depth for fast CPU compilation."""
    if name == "ctrl_uniter_base":
        return zoo.single_stream("uniter", depth=2, **SMALL)
    if name == "ctrl_visualbert_base":
        return zoo.single_stream("visualbert", depth=2, **SMALL)
    if name == "ctrl_vl-bert_base":
        return zoo.single_stream(
            "vl-bert", depth=2, type_vocab_size=3,
            v_coordinate_embeddings_dim=8, image_head_ln=False, **SMALL)
    if name == "ctrl_vilbert_base":
        return zoo.vilbert(depth_text=4, cross_start=2, **SMALL)
    if name == "ctrl_lxmert":
        return zoo.lxmert(n_text=3, n_vision=2, n_cross=2, **SMALL)
    if name == "vilbert_base":
        kw = dict(SMALL)
        kw.update(v_hidden_size=64, v_num_attention_heads=8,
                  v_intermediate_size=32)
        cfg = zoo.vilbert(depth_text=4, cross_start=2, **kw)
        cfg.sublayer2attn_hidden_size = {str(n): 64 for n in cfg.tv_attn_sublayers}
        cfg.sublayer2num_attention_heads = {
            str(n): 8 for n in cfg.tv_attn_sublayers}
        return cfg
    if name == "lxmert":
        return zoo.lxmert(n_text=3, n_vision=2, n_cross=2,
                          **{**SMALL, "num_locs": 4},
                          add_global_imgfeat=None,
                          visual_target_weights={"3": 6.667, "4": 6.667,
                                                 "5": 6.667},
                          fusion_method="text")
    if name == "vl-bert_base":
        return zoo.single_stream(
            "vl-bert", depth=2, type_vocab_size=3,
            v_coordinate_embeddings_dim=8, image_head_ln=False,
            num_locs=4, add_global_imgfeat="last",
            visual_target_weights={"6": 1.0}, fusion_method="none", **SMALL)
    raise KeyError(name)


def batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, cfg.vocab_size, (B, L)).astype(np.int32)
    ids[:, -3:] = 0  # padding
    feats = rng.randn(B, K, cfg.v_feature_size).astype(np.float32)
    locs = rng.rand(B, K, cfg.num_locs).astype(np.float32)
    types = np.zeros((B, L), np.int32)
    mask = (ids != 0).astype(np.int32)
    vmask = np.ones((B, K), np.int32)
    vmask[:, -2:] = 0
    return ids, feats, locs, types, mask, vmask


def init_model(model, *args, **kw):
    return jax.jit(lambda rng: model.init(rng, *args, **kw))(
        jax.random.PRNGKey(0))


@pytest.mark.parametrize("name", zoo.ZOO_NAMES)
def test_backbone_forward(name):
    cfg = tiny_zoo(name)
    model = VoltaModel(cfg)
    ids, feats, locs, types, mask, vmask = batch(cfg)
    params = init_model(model, ids, feats, locs, types, mask, vmask)
    seq_t, seq_v, pooled_t, pooled_v, extras = model.apply(
        params, ids, feats, locs, types, mask, vmask)
    assert seq_t.shape == (B, L, cfg.hidden_size)
    assert seq_v.shape == (B, K, cfg.v_hidden_size)
    if cfg.fusion_method not in ("none",):
        assert pooled_t.shape == (B, cfg.pooler_size)
    if cfg.fusion_method in ("sum", "mul"):
        assert pooled_v.shape == (B, cfg.v_pooler_size)
    assert extras["word_table"].shape == (cfg.vocab_size, cfg.hidden_size)
    assert np.all(np.isfinite(np.asarray(seq_t)))
    assert np.all(np.isfinite(np.asarray(seq_v)))


def test_full_depth_uniter():
    """One real (full-plan) config end to end."""
    cfg = zoo.build("ctrl_uniter_base")
    for k, v in SMALL.items():
        setattr(cfg, k, v)
    model = VoltaModel(cfg)
    ids, feats, locs, types, mask, vmask = batch(cfg)
    params = init_model(model, ids, feats, locs, types, mask, vmask)
    seq_t, seq_v, pooled_t, pooled_v, _ = jax.jit(
        lambda p: model.apply(p, ids, feats, locs, types, mask, vmask))(params)
    assert seq_t.shape == (B, L, cfg.hidden_size)
    assert np.all(np.isfinite(np.asarray(seq_t)))


@pytest.mark.parametrize("name", ["ctrl_uniter_base", "ctrl_vilbert_base",
                                  "vl-bert_base", "lxmert"])
def test_pretraining_forward(name):
    cfg = tiny_zoo(name)
    model = VoltaForVLPreTraining(cfg)
    ids, feats, locs, types, mask, vmask = batch(cfg)
    params = init_model(model, ids, feats, locs, types, mask, vmask)
    out = model.apply(params, ids, feats, locs, types, mask, vmask)
    assert out["mlm_logits"].shape == (B, L, cfg.vocab_size)
    for ix, w in cfg.visual_target_weights.items():
        if w > 0:
            assert ix in out["mrm_logits"]
    if cfg.fusion_method in ("sum", "mul", "text"):
        assert out["itm_logits"].shape == (B, 2)
    else:
        assert out["itm_logits"] is None


def test_tasks_forward_and_train_mode():
    cfg = tiny_zoo("ctrl_uniter_base")
    task_cfg = {
        "TASK1": {"type": "VL-classifier", "num_labels": 17, "process": "normal"},
        "TASK10": {"type": "V-logit", "process": "normal"},
        "TASK12": {"type": "VL-binary-classifier", "num_labels": 2,
                   "process": "nlvr"},
    }
    model = VoltaForVLTasks(cfg, task_cfg, ("TASK1", "TASK10", "TASK12"))
    ids, feats, locs, types, mask, vmask = batch(cfg)
    params = init_model(model, ids, feats, locs, "TASK1", types, mask, vmask)
    pred, _ = model.apply(params, ids, feats, locs, "TASK1", types, mask, vmask)
    assert pred.shape == (B, 17)
    pred, _ = model.apply(params, ids, feats, locs, "TASK10", types, mask, vmask)
    assert pred.shape == (B, K, 1)
    # masked regions forced to -10000
    assert np.asarray(pred)[0, -1, 0] < -9000
    pred, _ = model.apply(params, ids, feats, locs, "TASK12", types, mask, vmask)
    assert pred.shape == (B // 2, 2)
    # training mode with dropout rngs
    pred, _ = model.apply(
        params, ids, feats, locs, "TASK1", types, mask, vmask,
        deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert pred.shape == (B, 17)


def test_attention_probs_output():
    cfg = tiny_zoo("ctrl_vilbert_base")
    model = VoltaModel(cfg)
    ids, feats, locs, types, mask, vmask = batch(cfg)
    params = init_model(model, ids, feats, locs, types, mask, vmask)
    *_, extras = model.apply(params, ids, feats, locs, types, mask, vmask,
                             output_probs=True)
    n_attn = len(set(cfg.tt_attn_sublayers) | set(cfg.tv_attn_sublayers) |
                 set(cfg.vt_attn_sublayers) | set(cfg.vv_attn_sublayers))
    assert len(extras["probs"]) == n_attn


def test_visualization_train_mode():
    """cfg.visualization must compose with train-mode dropout: probs are
    captured post-dropout (reference volta/encoders.py:288-314) and
    gradients still flow through the capturing forward."""
    import jax.numpy as jnp

    cfg = tiny_zoo("ctrl_vilbert_base")
    cfg.visualization = True
    cfg.attention_probs_dropout_prob = 0.1
    cfg.hidden_dropout_prob = 0.1
    model = VoltaModel(cfg)
    ids, feats, locs, types, mask, vmask = batch(cfg)
    params = init_model(model, ids, feats, locs, types, mask, vmask)

    def loss(p):
        seq_t, *_, extras = model.apply(
            p, ids, feats, locs, types, mask, vmask, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)})
        # capture rides along without being part of the loss
        assert len(extras["probs"]) > 0
        t_data, _ = extras["probs"][0]
        assert t_data["intra_attn"] is not None
        return jnp.sum(seq_t ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)
