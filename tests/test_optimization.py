import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from volta_tpu.optimization import (adamw, build_optimizer, no_decay_mask,
                                    plain_radam, radam,
                                    warmup_constant_schedule,
                                    warmup_linear_schedule)


def test_warmup_linear_values():
    s = warmup_linear_schedule(1.0, 10, 100)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), 0.5)
    np.testing.assert_allclose(float(s(10)), 1.0)
    np.testing.assert_allclose(float(s(55)), 0.5)
    np.testing.assert_allclose(float(s(100)), 0.0)


def test_warmup_constant_values():
    s = warmup_constant_schedule(2.0, 4)
    np.testing.assert_allclose(float(s(2)), 1.0)
    np.testing.assert_allclose(float(s(50)), 2.0)


def test_no_decay_mask_paths():
    params = {
        "encoder": {
            "attn_0": {
                "query": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)},
                "out_ln": {"scale": jnp.ones(2), "bias": jnp.ones(2)},
            }
        },
        "embeddings": {"layer_norm": {"scale": jnp.ones(2)},
                       # reference filter blind spots: torch names without
                       # a "LayerNorm" substring ARE decayed there
                       "feat_ln": {"scale": jnp.ones(2)},
                       "visual_ln_text": {"scale": jnp.ones(2)}},
        "v_embeddings": {"feat_ln": {"scale": jnp.ones(2)}},  # ImgLayerNorm
        "clf_VQA": {"ln": {"scale": jnp.ones(2),
                           "bias": jnp.ones(2)}},  # logit_fc.2
        "cls": {"predictions": {"decoder_bias": jnp.ones(2)}},
    }
    m = no_decay_mask(params)
    assert m["encoder"]["attn_0"]["query"]["kernel"] is True
    assert m["encoder"]["attn_0"]["query"]["bias"] is False
    assert m["encoder"]["attn_0"]["out_ln"]["scale"] is False
    assert m["embeddings"]["layer_norm"]["scale"] is False
    assert m["embeddings"]["feat_ln"]["scale"] is True
    assert m["embeddings"]["visual_ln_text"]["scale"] is True
    assert m["v_embeddings"]["feat_ln"]["scale"] is False
    assert m["clf_VQA"]["ln"]["scale"] is True
    assert m["clf_VQA"]["ln"]["bias"] is False
    assert m["cls"]["predictions"]["decoder_bias"] is False


def test_adamw_no_bias_correction_formula():
    """First step with correct_bias=False: update = lr * m1/(sqrt(v1)+eps)
    with m1=(1-b1)g, v1=(1-b2)g^2 — NOT the bias-corrected g/(|g|+eps)."""
    lr, b1, b2, eps = 0.1, 0.9, 0.999, 1e-6
    tx = adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=0.0)
    p = {"w": jnp.array([2.0])}
    g = {"w": jnp.array([0.5])}
    st = tx.init(p)
    upd, _ = tx.update(g, st, p)
    expect = -lr * ((1 - b1) * 0.5) / (np.sqrt((1 - b2) * 0.25) + eps)
    np.testing.assert_allclose(float(upd["w"][0]), expect, rtol=1e-5)


def test_radam_early_steps_sgd_like():
    """N_sma < 5 during the first steps: both RAdam and the reference's
    PlainRAdam degenerate to the SGD-with-momentum-scaling step lr*m/(1-b1^t)
    (volta/optimization.py:78-79,164-166 — the reference's PlainRAdam keeps
    the fallback; only the upstream repo's variant drops it)."""
    p = {"w": jnp.array([1.0])}
    g = {"w": jnp.array([1.0])}
    for tx in (radam(0.1, weight_decay=0.0),
               plain_radam(0.1, weight_decay=0.0)):
        st = tx.init(p)
        upd, _ = tx.update(g, st, p)
        # first step: m = 0.1*g, step = lr*m/(1-0.9) = 0.1*g
        np.testing.assert_allclose(float(upd["w"][0]), -0.1, rtol=1e-6)


def test_grad_accumulation_equivalence():
    """k accumulation micro-steps == one step on the averaged gradient."""
    params = {"w": jnp.ones((3,))}
    tx_full = build_optimizer("adamw", 0.01, params, weight_decay=0.0)
    tx_acc = build_optimizer("adamw", 0.01, params, weight_decay=0.0,
                             grad_accum_steps=2)
    g1 = {"w": jnp.array([1.0, 2.0, 3.0])}
    g2 = {"w": jnp.array([3.0, 2.0, 1.0])}
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

    p_full = params
    st = tx_full.init(p_full)
    upd, st = tx_full.update(g_mean, st, p_full)
    p_full = optax.apply_updates(p_full, upd)

    p_acc = params
    st2 = tx_acc.init(p_acc)
    for g in (g1, g2):
        upd, st2 = tx_acc.update(g, st2, p_acc)
        p_acc = optax.apply_updates(p_acc, upd)
    np.testing.assert_allclose(np.asarray(p_full["w"]),
                               np.asarray(p_acc["w"]), rtol=1e-6)


def test_vlogit_mc_loss_path():
    from volta_tpu.task_utils import task_loss_and_score

    B, R, C = 2, 110, 4
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(B, R, 1).astype(np.float32))
    mc = jnp.asarray(rng.randint(0, 8, (B, C)).astype(np.int32))
    target = np.zeros((B, C, 1), np.float32)
    target[:, 1, 0] = 1.0
    batch = {"target": jnp.asarray(target), "multi_choice_ids": mc}
    loss, score = task_loss_and_score(
        "V-logit-mc", pred, batch, {"batch_size": B, "num_options": 1})
    assert np.isfinite(float(loss))
    assert 0 <= float(score) <= B


def test_freeze_mask_blocks_updates():
    from volta_tpu.train_utils import apply_freeze

    params = {"bert": {"embeddings": {"word_embeddings":
                                      {"embedding": jnp.ones((4, 2))}},
                       "encoder": {"attn_0": {"query":
                                              {"kernel": jnp.ones((2, 2))}}}}}
    tx = apply_freeze(optax.sgd(1.0), params, ["embeddings"])
    st = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(g, st, params)
    assert float(jnp.abs(
        upd["bert"]["embeddings"]["word_embeddings"]["embedding"]).sum()) == 0
    assert float(jnp.abs(
        upd["bert"]["encoder"]["attn_0"]["query"]["kernel"]).sum()) > 0


def test_init_classifier_from_answers(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    import fixtures
    from volta_tpu.data.tokenization import BertTokenizer
    from volta_tpu.train_utils import init_classifier_from_answers

    vocab = fixtures.make_vocab(str(tmp_path))
    tok = BertTokenizer(vocab)

    class DS:
        _tokenizer = tok
        ans2label = {"dog": 0, "cat": 1, "red ball": 2}

    hidden, num_labels = 8, 3
    rng = np.random.RandomState(0)
    word = rng.randn(len(tok), hidden).astype(np.float32)
    params = {
        "bert": {"embeddings": {"word_embeddings": {"embedding": word}}},
        "clf_TASK1": {"dense2": {"kernel": np.zeros((hidden, num_labels),
                                                    np.float32)}},
    }
    out = init_classifier_from_answers(params, "TASK1", DS())
    kernel = np.asarray(out["clf_TASK1"]["dense2"]["kernel"])
    # column for "dog" = its word embedding
    dog_id = tok.convert_tokens_to_ids(tok.tokenize("dog"))[0]
    np.testing.assert_allclose(kernel[:, 1], word[dog_id], rtol=1e-6)
    # "red ball" = mean of two token embeddings (sorted order: cat, dog, red ball)
    ids = tok.convert_tokens_to_ids(tok.tokenize("red ball"))
    np.testing.assert_allclose(kernel[:, 2], word[np.asarray(ids)].mean(0),
                               rtol=1e-6)


def test_build_optimizer_betas_eps_correct_bias_wired():
    """--adam_betas / --adam_epsilon / --adam_correct_bias must actually
    reach the update rule (reference: train_concap.py:101,227 runs AdamW at
    betas (0.9, 0.98))."""
    params = {"w": jnp.ones((4,), jnp.float32)}
    g = {"w": jnp.full((4,), 0.5, jnp.float32)}

    def upd(**kw):
        tx = build_optimizer("adamw", lambda s: 1e-3, params, **kw)
        st = tx.init(params)
        u1, st = tx.update(g, st, params)
        u2, _ = tx.update(g, st, params)  # step 2 separates b1 effects
        return np.asarray(u2["w"])

    base = upd()
    assert not np.allclose(base, upd(betas=(0.9, 0.98)))
    assert not np.allclose(base, upd(eps=1e-2))
    assert not np.allclose(base, upd(correct_bias=True))
    np.testing.assert_allclose(base, upd(betas=(0.9, 0.999), eps=1e-6))


def test_adamw_bf16_state_dtype():
    """Opt-in reduced-precision moments: states stored bf16, update within
    bf16-mantissa tolerance of the f32-state update; default (None) stays
    f32 (the golden-formula tests above pin its exact numerics)."""
    params = {"w": jnp.linspace(0.1, 1.0, 8).astype(jnp.float32)}
    g = {"w": jnp.linspace(-0.5, 0.5, 8).astype(jnp.float32)}

    def run(state_dtype):
        tx = build_optimizer("adamw", lambda s: 1e-3, params,
                             state_dtype=state_dtype)
        st = tx.init(params)
        for _ in range(3):
            u, st = tx.update(g, st, params)
        return np.asarray(u["w"]), st

    u32, st32 = run(None)
    ub, stb = run(jnp.bfloat16)
    leaves32 = jax.tree_util.tree_leaves(st32)
    leavesb = jax.tree_util.tree_leaves(stb)
    assert all(l.dtype == jnp.float32 for l in leaves32 if l.ndim)
    assert any(l.dtype == jnp.bfloat16 for l in leavesb if l.ndim)
    assert ub.dtype == np.float32  # updates stay f32 either way
    np.testing.assert_allclose(u32, ub, rtol=2e-2, atol=1e-5)


def test_lr_scales_match_per_group_torch_semantics():
    """A leaf with lr_scale s must update exactly like a torch AdamW
    param-group at lr = s * base_lr — including the decoupled decay, which
    torch multiplies by the group lr (p -= lr_g * (adam_dir + wd * p))."""
    params = {"trunk": jnp.linspace(0.2, 1.0, 6).astype(jnp.float32),
              "head": jnp.linspace(-1.0, 1.0, 6).astype(jnp.float32)}
    g = {"trunk": jnp.linspace(-0.3, 0.3, 6).astype(jnp.float32),
         "head": jnp.linspace(0.4, -0.4, 6).astype(jnp.float32)}
    base_lr, s, wd = 1e-2, 0.1, 0.01

    def run(lr, keys, lr_scales=None):
        p = {k: params[k] for k in keys}
        tx = build_optimizer("adamw", lambda _: lr, p, weight_decay=wd,
                             lr_scales=None if lr_scales is None else
                             {k: lr_scales[k] for k in keys})
        st = tx.init(p)
        for _ in range(4):
            u, st = tx.update({k: g[k] for k in keys}, st, p)
            p = optax.apply_updates(p, u)
        return p

    scaled = run(base_lr, ("trunk", "head"),
                 lr_scales={"trunk": s, "head": 1.0})
    trunk_alone = run(base_lr * s, ("trunk",))
    head_alone = run(base_lr, ("head",))
    np.testing.assert_allclose(scaled["trunk"], trunk_alone["trunk"],
                               rtol=1e-6)
    np.testing.assert_allclose(scaled["head"], head_alone["head"], rtol=1e-6)


def test_lr_scales_from_loaded_paths():
    from volta_tpu.optimization import lr_scales_from_loaded

    params = {"embeddings": {"word_emb": {"embedding": jnp.zeros(3)}},
              "clf_1": {"dense": {"kernel": jnp.zeros((2, 2))}}}
    scales = lr_scales_from_loaded(
        params, ["embeddings.word_emb.embedding"], 0.1)
    assert scales["embeddings"]["word_emb"]["embedding"] == 0.1
    assert scales["clf_1"]["dense"]["kernel"] == 1.0


def test_skip_disconnected_semantics():
    """Whole-tensor-zero grads get NO update (decay included), like torch's
    grad-None skip; nonzero-grad tensors keep normal AdamW + decay."""
    params = {"used": jnp.linspace(0.5, 1.0, 4).astype(jnp.float32),
              "dead": jnp.linspace(-1.0, 1.0, 4).astype(jnp.float32)}
    g = {"used": jnp.array([0.1, -0.2, 0.3, -0.4], jnp.float32),
         "dead": jnp.zeros(4, jnp.float32)}

    def run(skip):
        tx = build_optimizer("adamw", lambda _: 1e-2, params,
                             weight_decay=0.1, clip_norm=1.0,
                             skip_disconnected_params=skip)
        p, st = dict(params), tx.init(params)
        for _ in range(3):
            u, st = tx.update(g, st, p)
            p = optax.apply_updates(p, u)
        return p

    base, skipped = run(False), run(True)
    np.testing.assert_allclose(skipped["used"], base["used"], rtol=1e-6)
    np.testing.assert_array_equal(skipped["dead"], params["dead"])  # frozen
    assert not np.allclose(base["dead"], params["dead"])  # default decays
