"""In-kernel hidden-dropout mask piggyback (cfg.fuse_hidden_dropout).

The dropout-attention kernel can emit the two hidden-dropout keep masks of
the attn+FFN sublayer pair from its already-seeded PRNG
(ops/pallas_attention.pallas_dropout_attention_hm), replacing one XLA RNG
pass per dropout site. CPU coverage runs the genuine kernel under the Mosaic
simulator (all-zero PRNG bits -> all-keep masks; real mask statistics are
validated on hardware by tools/validate_tpu.py) plus the pure-XLA
keep_mask plumbing in LayerNorm.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volta_tpu.ops.pallas_attention import (interpret_mode,
                                            pallas_dropout_attention_hm)

B, LQ, LK, H, D = 8, 16, 16, 4, 32
SCALE = D ** -0.5


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, LQ, H, D).astype(np.float32)
    k = rng.randn(B, LK, H, D).astype(np.float32)
    v = rng.randn(B, LK, H, D).astype(np.float32)
    bias = np.zeros((B, 1, 1, LK), np.float32)
    bias[:, :, :, -2:] = -10000.0
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bias))


def _xla_attention(q, k, v, bias, scale):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def test_hm_kernel_rate0_matches_xla_and_emits_masks():
    q, k, v, bias = _inputs(0)
    with interpret_mode():
        out, hm0, hm1 = jax.jit(lambda *a: pallas_dropout_attention_hm(
            *a, SCALE, 0.0, 0.3, 5))(q, k, v, bias)
    ref = _xla_attention(q, k, v, bias, SCALE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert hm0.shape == (B, LQ, H * D) and hm0.dtype == jnp.bfloat16
    assert hm1.shape == (B, LQ, H * D)
    # simulator PRNG returns all-zero bits -> every draw keeps
    assert float(jnp.min(hm0)) == 1.0 and float(jnp.min(hm1)) == 1.0


def test_hm_kernel_grads_match_xla_at_rate0():
    q, k, v, bias = _inputs(1)

    def loss_hm(q, k, v):
        out, _, _ = pallas_dropout_attention_hm(q, k, v, bias, SCALE, 0.0,
                                                0.2, 9)
        return jnp.sum(out * out)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, bias, SCALE) ** 2)

    with interpret_mode():
        g_hm = jax.jit(jax.grad(loss_hm, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g_hm, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_layernorm_keep_mask_matches_manual():
    """LayerNorm residual mode with a precomputed keep mask must equal the
    manual dropout-by-mask + residual + LN composition."""
    from volta_tpu.models.layers import LayerNorm, layer_norm_ref

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 6, 32).astype(np.float32))
    res = jnp.asarray(rng.randn(4, 6, 32).astype(np.float32))
    mask = jnp.asarray((rng.rand(4, 6, 32) > 0.1).astype(np.float32))
    rate = 0.1

    ln = LayerNorm(32)
    params = ln.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape), p.dtype), params)
    got = ln.apply(params, x, residual=res, drop_rate=rate,
                   deterministic=False, keep_mask=mask,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    manual = layer_norm_ref(
        jnp.where(mask > 0, x / (1 - rate), 0.0) + res,
        params["params"]["scale"], params["params"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(manual),
                               rtol=1e-6, atol=1e-6)
    # all-zero mask -> pure residual LN
    got0 = ln.apply(params, x, residual=res, drop_rate=rate,
                    deterministic=False, keep_mask=jnp.zeros_like(mask),
                    rngs={"dropout": jax.random.PRNGKey(1)})
    manual0 = layer_norm_ref(res, params["params"]["scale"],
                             params["params"]["bias"])
    np.testing.assert_allclose(np.asarray(got0), np.asarray(manual0),
                               rtol=1e-6, atol=1e-6)


def test_hash_dropout_statistics():
    """Counter-based dropout (murmur3 fmix32 over position counters): keep
    fraction, scaling, seed sensitivity, and whitening sanity."""
    from volta_tpu.models.layers import hash_dropout

    x = jnp.ones((64, 1024), jnp.float32)
    y1 = np.asarray(hash_dropout(x, jax.random.PRNGKey(0), 0.1))
    y1b = np.asarray(hash_dropout(x, jax.random.PRNGKey(0), 0.1))
    y2 = np.asarray(hash_dropout(x, jax.random.PRNGKey(1), 0.1))
    np.testing.assert_array_equal(y1, y1b)  # same key reproduces
    keep1 = y1 > 0
    assert abs(keep1.mean() - 0.9) < 0.01
    assert not np.array_equal(keep1, y2 > 0)
    np.testing.assert_allclose(y1[keep1], 1 / 0.9, rtol=1e-6)
    # adjacent-counter decorrelation (avalanche sanity)
    f = keep1.astype(np.float64).ravel()
    corr = np.corrcoef(f[:-1], f[1:])[0, 1]
    assert abs(corr) < 0.02, corr
    # per-row keep rates concentrate like iid draws (no stripes)
    rm = keep1.mean(axis=1)
    assert rm.std() < 3 * np.sqrt(0.1 * 0.9 / 1024), rm.std()


def test_pallas_keep_mask_interpret():
    """Keep-mask generator under the simulator: shape/dtype, all-keep
    (all-zero sim PRNG bits), gradient isolation via stop_gradient."""
    from volta_tpu.ops.dropout_mask import pallas_keep_mask, supported

    assert supported((16, 4, 128)) and not supported((16, 4, 100))
    with interpret_mode():
        m = jax.jit(lambda s: pallas_keep_mask((6, 8, 128), 0.25, s))(3)
    assert m.shape == (6, 8, 128) and m.dtype == jnp.bfloat16
    assert float(jnp.min(m)) == 1.0  # simulator bits are all zero

    def loss(x):
        with interpret_mode():
            mask = pallas_keep_mask((4, 128), 0.5, 7)
        return jnp.sum(jnp.where(mask > 0, x / 0.5, 0.0) ** 2)

    x = jnp.ones((4, 128))
    g = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g), 8.0)  # 2*(x/0.5)/0.5


def test_layernorm_pallas_mask_path_matches_manual():
    """LayerNorm with pallas_mask under the simulator equals the manual
    all-keep composition (sim masks are all ones)."""
    from volta_tpu.models.layers import LayerNorm, layer_norm_ref

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 8, 128).astype(np.float32))
    res = jnp.asarray(rng.randn(4, 8, 128).astype(np.float32))
    rate = 0.2
    ln = LayerNorm(128, pallas_mask=True)
    params = ln.init(jax.random.PRNGKey(0), x)
    with interpret_mode():
        got = ln.apply(params, x, residual=res, drop_rate=rate,
                       deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    manual = layer_norm_ref(x / (1 - rate) + res,
                            params["params"]["scale"],
                            params["params"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(manual),
                               rtol=1e-5, atol=1e-5)


def test_encoder_uses_piggyback_and_grads_finite(monkeypatch):
    """The fused single-stream train path must route through the hm kernel
    when fuse_hidden_dropout is on, and fwd+bwd must stay finite."""
    from volta_tpu import zoo
    from volta_tpu.models import VoltaForVLTasks
    from volta_tpu.ops import pallas_attention as pa

    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=128, num_attention_heads=4,
        intermediate_size=256, pooler_size=128, v_pooler_size=128,
        vocab_size=64, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=128, v_num_attention_heads=4, v_intermediate_size=256,
        clf_hidden_size=64)
    cfg.use_pallas = True
    cfg.fuse_hidden_dropout = True
    task_cfg = {"T": {"type": "VL-classifier", "num_labels": 5}}
    model = VoltaForVLTasks(cfg, task_cfg, ("T",))

    rng = np.random.RandomState(0)
    b, l, k = 8, 10, 6
    ids = jnp.asarray(rng.randint(1, 64, (b, l)), jnp.int32)
    feats = jnp.asarray(rng.randn(b, k, 32), jnp.float32)
    locs = jnp.asarray(rng.rand(b, k, 5), jnp.float32)
    seg = jnp.zeros((b, l), jnp.int32)
    tmask = jnp.ones((b, l), jnp.int32)
    vmask = jnp.ones((b, k), jnp.int32)

    params = model.init(jax.random.PRNGKey(0), ids, feats, locs, "T", seg,
                        tmask, vmask)

    calls = []
    orig = pa.pallas_dropout_attention_hm

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(pa, "pallas_dropout_attention_hm", spy)
    # the encoder imports the symbol from the module at call time
    import volta_tpu.models.encoder as enc  # noqa: F401

    def loss(p):
        pred, _ = model.apply(
            p, ids, feats, locs, "T", seg, tmask, vmask,
            deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(pred ** 2)

    with interpret_mode():
        val, g = jax.value_and_grad(loss)(params)
    assert calls, "piggyback kernel was not used"
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
