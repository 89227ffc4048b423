"""Numerics tests for the fused dropout+residual+LayerNorm kernel.

The rate>0 forward draws from the TPU Mosaic PRNG (no CPU lowering), so CPU
coverage is: (a) rate=0 fwd+bwd parity vs the XLA composition in interpret
mode, and (b) the backward kernel against the autodiff of the reference
composition under a fabricated dropout mask. Hardware mask statistics are
covered by tools/validate_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volta_tpu.models.layers import layer_norm_ref
from volta_tpu.ops import fused_residual as fr


def _ref(o, x, scale, bias, mask=None, rate=0.0):
    if mask is not None:
        o = jnp.where(mask, o / (1.0 - rate), 0.0)
    return layer_norm_ref(o + x, scale, bias)


def test_rate0_forward_backward_parity():
    rng = np.random.RandomState(0)
    n, d = 64, 128
    o = jnp.asarray(rng.randn(n, d), jnp.float32)
    x = jnp.asarray(rng.randn(n, d), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(d), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(d), jnp.float32)
    g = jnp.asarray(rng.randn(n, d), jnp.float32)

    y = fr.dropout_residual_ln(o, x, scale, bias, 0, 0.0, interpret=True)
    y_ref = _ref(o, x, scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)

    def f_kernel(o, x, scale, bias):
        return jnp.sum(fr.dropout_residual_ln(o, x, scale, bias, 0, 0.0,
                                              interpret=True) * g)

    def f_ref(o, x, scale, bias):
        return jnp.sum(_ref(o, x, scale, bias) * g)

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(o, x, scale, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(o, x, scale, bias)
    for a, b, name in zip(gk, gr, ("do", "dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_backward_kernel_vs_autodiff_with_mask():
    """Feed the bwd kernel fabricated residuals for a known mask and compare
    against autodiff of the reference composition."""
    rng = np.random.RandomState(1)
    n, d, rate = 32, 128, 0.25
    o = jnp.asarray(rng.randn(n, d), jnp.float32)
    x = jnp.asarray(rng.randn(n, d), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(d), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(d), jnp.float32)
    g = jnp.asarray(rng.randn(n, d), jnp.float32)
    mask = jnp.asarray(rng.rand(n, d) > rate)

    od32 = jnp.where(mask, o / (1.0 - rate), 0.0)
    od = od32.astype(jnp.bfloat16)
    # the kernel recomputes statistics from the saved bf16 od — build the
    # reference the same way so the comparison isolates the VJP math
    s = od.astype(jnp.float32) + x
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-12)

    res = (od, mask.astype(od.dtype), x, scale, mean, rstd, (n, d))
    do, dx, dscale, dbias, _ = fr._bwd_call(rate, 1e-12, True, "pallas",
                                            res, g)
    # the XLA backward must agree with the Pallas backward kernel
    do2, dx2, dscale2, dbias2, _ = fr._bwd_call(rate, 1e-12, True, "xla",
                                                res, g)
    np.testing.assert_allclose(np.asarray(do2), np.asarray(do),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(dscale2), np.asarray(dscale),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(dbias2), np.asarray(dbias),
                               atol=2e-2, rtol=2e-2)

    def f(o_, x_, scale_, bias_):
        od_ = jnp.where(mask, o_ / (1.0 - rate), 0.0).astype(
            jnp.bfloat16).astype(jnp.float32)
        return jnp.sum(layer_norm_ref(od_ + x_, scale_, bias_) * g)

    r_do, r_dx, r_dscale, r_dbias = jax.grad(f, argnums=(0, 1, 2, 3))(
        o, x, scale, bias)
    # tolerances reflect the bf16 saved-residual quantization; the exact
    # math is covered by test_rate0_forward_backward_parity
    np.testing.assert_allclose(np.asarray(dx), np.asarray(r_dx),
                               atol=1e-2, rtol=1e-2)
    # do: the kernel scales by the SAVED keep mask / (1-rate); the
    # autodiff reference also routes through the bf16 cast
    np.testing.assert_allclose(np.asarray(do), np.asarray(r_do),
                               atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(dscale), np.asarray(r_dscale),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(r_dbias),
                               atol=2e-2, rtol=2e-2)


def test_supported_shapes():
    assert fr.supported(jnp.zeros((16, 4, 128)))
    assert not fr.supported(jnp.zeros((3, 1, 128)))   # 3 rows
    assert not fr.supported(jnp.zeros((16, 4, 96)))   # d % 128


def test_deterministic_residual_mode_matches_composition():
    """LayerNorm residual mode in deterministic mode == drop-free
    composition (the module-level integration contract)."""
    from volta_tpu.models.layers import LayerNorm

    rng = np.random.RandomState(2)
    o = jnp.asarray(rng.randn(4, 6, 128), jnp.float32)
    x = jnp.asarray(rng.randn(4, 6, 128), jnp.float32)
    ln = LayerNorm(128)
    params = ln.init(jax.random.PRNGKey(0), o)
    y = ln.apply(params, o, x, drop_rate=0.1, deterministic=True)
    y_ref = ln.apply(params, o + x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)


def test_train_mode_cpu_fallback_statistics():
    """On CPU the residual mode falls back to bernoulli + LN; check the
    drop fraction and scaling."""
    from volta_tpu.models.layers import LayerNorm

    o = jnp.ones((64, 128), jnp.float32) * 2.0
    x = jnp.zeros((64, 128), jnp.float32)
    ln = LayerNorm(128, fused_residual=True)  # CPU -> fallback path
    params = ln.init(jax.random.PRNGKey(0), o)
    y = ln.apply(params, o, x, drop_rate=0.5, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(3)})
    # y is LN of a 0/4 pattern; roughly half the inputs survive
    assert np.asarray(y).std() > 0.5


def test_zero_activation_keeps_gradient():
    """Regression for the round-2 advisor finding: an element that is
    exactly 0.0 BEFORE dropout but kept by the mask must still receive
    gradient. The old backward recovered the mask as ``od != 0`` and
    silently zeroed it; the kernel now saves the mask explicitly. In
    interpret mode the Mosaic PRNG yields all-zero bits -> every element
    is kept, so any zero in ``o`` exercises the case deterministically.
    (rate>0 needs the Mosaic simulator: plain interpret has no prng_seed
    lowering.)"""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(3)
    n, d, rate = 16, 128, 0.25
    o = jnp.asarray(rng.randn(n, d), jnp.float32).at[0, :8].set(0.0)
    x = jnp.asarray(rng.randn(n, d), jnp.float32)
    scale = jnp.ones((d,), jnp.float32)
    bias = jnp.zeros((d,), jnp.float32)
    g = jnp.ones((n, d), jnp.float32)

    def f(o_):
        return jnp.sum(fr.dropout_residual_ln(
            o_, x, scale, bias, 0, rate,
            interpret=pltpu.InterpretParams()) * g)

    do = jax.grad(f)(o)
    # all-kept (interpret PRNG): do == dx * 1/(1-rate) everywhere,
    # INCLUDING the exact-zero positions
    def f_ref(o_):
        return jnp.sum(layer_norm_ref(o_ / (1.0 - rate) + x, scale, bias)
                       * g)

    do_ref = jax.grad(f_ref)(o)
    np.testing.assert_allclose(np.asarray(do), np.asarray(do_ref),
                               atol=2e-4, rtol=2e-4)
    assert float(jnp.max(jnp.abs(do[0, :8]))) > 0.0
