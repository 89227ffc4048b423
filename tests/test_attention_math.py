"""Math-level tests of the joint bimodal attention and fused LayerNorm.

The reference computes tt/tv scores separately, concatenates, softmaxes
jointly, splits back and sums two PV matmuls (reference:
volta/encoders.py:285-340). We verify our single fused attention over the
concatenated KV axis is numerically identical to an independent NumPy
implementation of that concat-softmax-split procedure.
"""

import numpy as np

import jax
import jax.numpy as jnp

from volta_tpu.ops.attention import (additive_mask, attention_out,
                                     attention_probs, fused_attention)
from volta_tpu.models.layers import layer_norm_ref


def np_concat_softmax_split(q, kt, kv, vt, vv, bt, bv, scale):
    """Independent NumPy re-derivation of the reference's gated softmax."""
    # q [B,H,Lq,D] layout here for clarity
    s_tt = q @ kt.transpose(0, 1, 3, 2) * scale + bt
    s_tv = q @ kv.transpose(0, 1, 3, 2) * scale + bv
    s = np.concatenate([s_tt, s_tv], axis=-1)
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    p_tt, p_tv = p[..., : kt.shape[2]], p[..., kt.shape[2]:]
    return p_tt @ vt + p_tv @ vv


def test_joint_equals_concat_softmax_split():
    rng = np.random.RandomState(0)
    B, H, Lq, Lt, Lv, D = 3, 4, 7, 7, 5, 8
    q = rng.randn(B, Lq, H, D).astype(np.float32)
    kt = rng.randn(B, Lt, H, D).astype(np.float32)
    vt = rng.randn(B, Lt, H, D).astype(np.float32)
    kv = rng.randn(B, Lv, H, D).astype(np.float32)
    vv = rng.randn(B, Lv, H, D).astype(np.float32)
    mt = (rng.rand(B, Lt) > 0.2).astype(np.float32)
    mv = (rng.rand(B, Lv) > 0.2).astype(np.float32)
    scale = 1.0 / np.sqrt(D)

    bt = np.asarray(additive_mask(jnp.asarray(mt)))
    bv = np.asarray(additive_mask(jnp.asarray(mv)))

    ref = np_concat_softmax_split(
        q.transpose(0, 2, 1, 3), kt.transpose(0, 2, 1, 3),
        kv.transpose(0, 2, 1, 3), vt.transpose(0, 2, 1, 3),
        vv.transpose(0, 2, 1, 3), bt, bv, scale)
    ref = ref.transpose(0, 2, 1, 3)  # back to [B,Lq,H,D]

    k = jnp.concatenate([jnp.asarray(kt), jnp.asarray(kv)], axis=1)
    v = jnp.concatenate([jnp.asarray(vt), jnp.asarray(vv)], axis=1)
    bias = jnp.concatenate([jnp.asarray(bt), jnp.asarray(bv)], axis=-1)
    got = fused_attention(jnp.asarray(q), k, v, bias, scale, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)

    probs = attention_probs(jnp.asarray(q), k, bias, scale)
    got2 = attention_out(probs, v)
    np.testing.assert_allclose(np.asarray(got2), ref, rtol=1e-5, atol=1e-6)


def test_single_source_softmax():
    """With only one KV source the joint softmax is a plain softmax."""
    rng = np.random.RandomState(1)
    B, H, L, D = 2, 2, 6, 4
    q = rng.randn(B, L, H, D).astype(np.float32)
    k = rng.randn(B, L, H, D).astype(np.float32)
    v = rng.randn(B, L, H, D).astype(np.float32)
    scale = 1.0 / np.sqrt(D)
    got = fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          None, scale, use_pallas=False)
    qh = q.transpose(0, 2, 1, 3)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    s = qh @ kh.transpose(0, 1, 3, 2) * scale
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ref = (p @ vh).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_layernorm_matches_two_pass_numpy():
    rng = np.random.RandomState(2)
    x = rng.randn(5, 33, 64).astype(np.float32) * 3 + 1
    scale = rng.randn(64).astype(np.float32)
    bias = rng.randn(64).astype(np.float32)
    u = x.mean(-1, keepdims=True)
    s = ((x - u) ** 2).mean(-1, keepdims=True)
    ref = (x - u) / np.sqrt(s + 1e-12) * scale + bias
    got = layer_norm_ref(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_pallas_layernorm_interpret_mode():
    """Run the Pallas LN kernel in interpreter mode on CPU and check fwd+bwd
    against the XLA reference (mirrors apex L0 run_fused_layer_norm)."""
    from volta_tpu.ops import layernorm as lnmod

    rng = np.random.RandomState(3)
    n, d = 16, 128
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    scale = jnp.asarray(rng.randn(d).astype(np.float32))
    bias = jnp.asarray(rng.randn(d).astype(np.float32))

    import functools
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    with mock.patch.object(pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        out = lnmod._pallas_layer_norm(x, scale, bias, 1e-12)
        ref = layer_norm_ref(x, scale, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        def loss_pallas(x, s, b):
            return jnp.sum(jnp.sin(lnmod._pallas_layer_norm(x, s, b, 1e-12)))

        def loss_ref(x, s, b):
            return jnp.sum(jnp.sin(layer_norm_ref(x, s, b)))

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)


def test_pallas_attention_interpret_mode():
    from volta_tpu.ops.pallas_attention import _pallas_forward, interpret_mode
    from volta_tpu.ops.attention import _xla_fused_attention

    rng = np.random.RandomState(4)
    B, Lq, Lk, H, D = 8, 16, 24, 2, 32
    q = jnp.asarray(rng.randn(B, Lq, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, H, D).astype(np.float32))
    mask = (rng.rand(B, Lk) > 0.3).astype(np.float32)
    bias = additive_mask(jnp.asarray(mask))
    scale = 1.0 / np.sqrt(D)

    with interpret_mode():
        got = _pallas_forward(q, k, v, bias, scale, batch_tile=4)
    ref = _xla_fused_attention(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_attention_custom_vjp():
    """The kernel's backward (XLA recompute) must match autodiff through
    the plain-XLA attention."""
    from volta_tpu.ops import pallas_attention as pa
    from volta_tpu.ops.attention import _xla_fused_attention

    rng = np.random.RandomState(5)
    B, Lq, Lk, H, D = 2, 6, 9, 2, 4
    q = jnp.asarray(rng.randn(B, Lq, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, H, D).astype(np.float32))
    bias = additive_mask(jnp.asarray(
        (rng.rand(B, Lk) > 0.3).astype(np.float32)))
    scale = 1.0 / np.sqrt(D)

    import functools
    from unittest import mock

    def loss_ref(q, k, v, bias):
        return jnp.sum(jnp.tanh(_xla_fused_attention(q, k, v, bias, scale)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    # exercise only the custom bwd (fwd via the XLA stand-in)
    with mock.patch.object(pa, "_pallas_forward",
                           lambda *a, **kw: _xla_fused_attention(*a[:5])):
        def loss_pal(q, k, v, bias):
            return jnp.sum(jnp.tanh(
                pa.pallas_fused_attention(q, k, v, bias, scale)))
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_pallas_dropout_attention_interpret():
    """In-kernel dropout: correct scaling, determinism per seed, and
    directional-derivative consistency of the custom VJP (interpret mode).

    Requires TPU PRNG primitives, which the CPU interpreter cannot lower;
    the same assertions run on hardware via tools/validate_tpu.py."""
    import pytest
    pytest.skip("pltpu.prng_seed has no CPU interpret lowering; "
                "covered by tools/validate_tpu.py on hardware")
    from volta_tpu.ops import pallas_attention as pa

    rng = np.random.RandomState(6)
    B, Lq, Lk, H, D = 8, 16, 16, 2, 32
    q = jnp.asarray(rng.randn(B, Lq, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, H, D).astype(np.float32))
    bias = jnp.zeros((B, 1, 1, Lk), jnp.float32)
    scale = 1.0 / np.sqrt(D)
    rate = 0.4

    import functools
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    patch = mock.patch.object(pl, "pallas_call",
                              functools.partial(orig, interpret=True))
    with patch:
        out1 = pa.pallas_dropout_attention(q, k, v, bias, scale, rate, 123,
                                           batch_tile=4)
        out2 = pa.pallas_dropout_attention(q, k, v, bias, scale, rate, 123,
                                           batch_tile=4)
        out3 = pa.pallas_dropout_attention(q, k, v, bias, scale, rate, 999,
                                           batch_tile=4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))
    # expectation preserved: mean over many seeds approaches no-dropout out
    from volta_tpu.ops.attention import _xla_fused_attention
    ref = np.asarray(_xla_fused_attention(q, k, v, bias, scale))
    with patch:
        acc = np.zeros_like(ref)
        n = 24
        for s in range(n):
            acc += np.asarray(pa.pallas_dropout_attention(
                q, k, v, bias, scale, rate, 1000 + s, batch_tile=4))
    np.testing.assert_allclose(acc / n, ref, atol=0.35)

    # custom VJP: out is linear in v, so a directional derivative must match
    # exactly for the same seed
    dv_dir = jnp.asarray(rng.randn(*v.shape).astype(np.float32)) * 0.1
    with patch:
        f = lambda vv: jnp.sum(pa.pallas_dropout_attention(
            q, k, vv, bias, scale, rate, 123, batch_tile=4))
        g_v = jax.grad(f)(v)
        lhs = float(f(v + dv_dir) - f(v))
    rhs = float(jnp.sum(g_v * dv_dir))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3)


def test_natural_layout_eval_kernel_interpret():
    """Natural-layout no-dropout kernel (fwd AND fused Pallas bwd) vs the
    XLA composition, under the Mosaic simulator."""
    from volta_tpu.ops import pallas_attention as pa
    from volta_tpu.ops.attention import _xla_fused_attention

    rng = np.random.RandomState(7)
    B, Lq, Lk, H, D = 8, 16, 24, 3, 32
    q = jnp.asarray(rng.randn(B, Lq, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, H, D).astype(np.float32))
    bias = additive_mask(jnp.asarray(
        (rng.rand(B, Lk) > 0.3).astype(np.float32)))
    scale = 1.0 / np.sqrt(D)

    with pa.interpret_mode():
        got = pa.pallas_fused_attention_nat(q, k, v, bias, scale)
    ref = _xla_fused_attention(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    def loss_ref(q, k, v, bias):
        return jnp.sum(jnp.tanh(_xla_fused_attention(q, k, v, bias, scale)))

    def loss_nat(q, k, v, bias):
        return jnp.sum(jnp.tanh(
            pa.pallas_fused_attention_nat(q, k, v, bias, scale)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    with pa.interpret_mode():
        g_nat = jax.grad(loss_nat, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_ref, g_nat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_natural_layout_dropout_kernel_interpret():
    """Natural-layout dropout kernel plumbing vs the head-major kernel
    under the Mosaic simulator (whose PRNG yields all-zero bits, so both
    keep everything at 1/keep scale — layout/spec equivalence is what this
    covers; the real-PRNG semantics run on hardware in validate_tpu.py)."""
    from volta_tpu.ops import pallas_attention as pa
    from volta_tpu.ops.attention import _xla_fused_attention

    rng = np.random.RandomState(8)
    B, Lq, Lk, H, D = 8, 16, 16, 2, 32
    q = jnp.asarray(rng.randn(B, Lq, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, H, D).astype(np.float32))
    bias = additive_mask(jnp.asarray(
        (rng.rand(B, Lk) > 0.3).astype(np.float32)))
    scale = 1.0 / np.sqrt(D)
    rate = 0.25

    with pa.interpret_mode():
        out_hm = pa.pallas_dropout_attention(q, k, v, bias, scale, rate, 42)
        out_nat = pa.pallas_dropout_attention(q, k, v, bias, scale, rate,
                                              42, natural=True)
    np.testing.assert_allclose(np.asarray(out_nat), np.asarray(out_hm),
                               rtol=1e-5, atol=1e-6)
    # simulator keep-all: out == xla_out / (1 - rate)
    ref = np.asarray(_xla_fused_attention(q, k, v, bias, scale)) / (1 - rate)
    np.testing.assert_allclose(np.asarray(out_nat), ref,
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(jnp.tanh(fn(q, k, v)))
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    with pa.interpret_mode():
        g_hm = loss(lambda q, k, v: pa.pallas_dropout_attention(
            q, k, v, bias, scale, rate, 42))
        g_nat = loss(lambda q, k, v: pa.pallas_dropout_attention(
            q, k, v, bias, scale, rate, 42, natural=True))
    for a, b in zip(g_hm, g_nat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
