"""TP x Pallas: execute the real attention kernels under a model>1 mesh.

The Pallas kernels cannot be split by GSPMD, so multi-device meshes run them
through the shard_map wrappers in volta_tpu/parallel/tp.py. Hardware here has
a single chip and the CPU tests default to the XLA path, which historically
left the TP x Pallas combination untested. The Mosaic TPU *simulator*
(``pltpu.InterpretParams``, exposed as ops.pallas_attention.interpret_mode())
closes that: the genuine kernels (incl. the saved-mask custom VJP) execute on
a data=2 x model=2 CPU mesh and are compared against single-device kernel
runs and plain XLA attention math.

Simulator caveat: its ``prng_random_bits`` returns all-zero bits, so dropout
masks degenerate to keep-everything. Rate-0 comparisons are exact semantics;
the rate>0 case checks sharded==unsharded plumbing (mask handling, 1/keep
scaling, seed offsets) rather than mask statistics — those are validated on
hardware by tools/validate_tpu.py.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from volta_tpu.ops.pallas_attention import (interpret_mode,
                                            pallas_dropout_attention,
                                            pallas_fused_attention)
from volta_tpu.parallel import tp

B, LQ, LK, H, D = 8, 16, 24, 4, 32
SCALE = D ** -0.5


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    return Mesh(devs, ("data", "model"))


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, LQ, H, D).astype(np.float32)
    k = rng.randn(B, LK, H, D).astype(np.float32)
    v = rng.randn(B, LK, H, D).astype(np.float32)
    bias = np.zeros((B, 1, 1, LK), np.float32)
    bias[:, :, :, -3:] = -10000.0  # padded keys
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias)


def _xla_attention(q, k, v, bias, scale):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def test_eval_kernel_tp_matches_xla(mesh):
    q, k, v, bias = _inputs(0)
    fn = functools.partial(pallas_fused_attention, scale=SCALE)
    with interpret_mode(), tp.mesh_context(mesh):
        assert tp.current_mesh() is mesh
        out = jax.jit(lambda *a: tp.shard_attention(fn, *a))(q, k, v, bias)
    ref = _xla_attention(q, k, v, bias, SCALE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_eval_kernel_pallas_bwd_matches_xla(mesh):
    """The fused no-dropout backward kernel (incl. the per-head dbias
    partial sums) must reproduce the XLA attention VJP — single device and
    under the TP shard_map wrapper."""
    q, k, v, bias = _inputs(4)

    def pal_loss(q, k, v, bias):
        out = pallas_fused_attention(q, k, v, bias, SCALE)
        return jnp.sum(jnp.tanh(out))

    def tp_loss(q, k, v, bias):
        fn = functools.partial(pallas_fused_attention, scale=SCALE)
        return jnp.sum(jnp.tanh(tp.shard_attention(fn, q, k, v, bias)))

    def xla_loss(q, k, v, bias):
        return jnp.sum(jnp.tanh(_xla_attention(q, k, v, bias, SCALE)))

    g_ref = jax.grad(xla_loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
    with interpret_mode():
        g_pal = jax.jit(jax.grad(pal_loss, argnums=(0, 1, 2, 3)))(
            q, k, v, bias)
        with tp.mesh_context(mesh):
            g_tp = jax.jit(jax.grad(tp_loss, argnums=(0, 1, 2, 3)))(
                q, k, v, bias)
    for got, want, name in zip(g_pal, g_ref, "qkvb"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
    for got, want, name in zip(g_tp, g_ref, "qkvb"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_dropout_kernel_tp_rate0_matches_single_device(mesh):
    q, k, v, bias = _inputs(1)
    fn = lambda q, k, v, bias, seed: pallas_dropout_attention(  # noqa: E731
        q, k, v, bias, SCALE, 0.0, seed)
    with interpret_mode():
        single = jax.jit(lambda *a: fn(*a, 7))(q, k, v, bias)
        with tp.mesh_context(mesh):
            sharded = jax.jit(lambda *a: tp.shard_dropout_attention(
                fn, *a, 7))(q, k, v, bias)
    # rate 0 == plain joint-softmax attention: exact semantics, and the
    # sharded run must agree with both the single-device kernel and XLA math
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-6, atol=1e-6)
    ref = _xla_attention(q, k, v, bias, SCALE)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dropout_kernel_tp_grads_match_xla(mesh):
    """The saved-mask backward kernel executes under shard_map: TP grads at
    rate 0 must equal the XLA attention VJP."""
    q, k, v, bias = _inputs(2)
    fn = lambda q, k, v, bias, seed: pallas_dropout_attention(  # noqa: E731
        q, k, v, bias, SCALE, 0.0, seed)

    def tp_loss(q, k, v):
        out = tp.shard_dropout_attention(fn, q, k, v, bias, 11)
        return jnp.sum(out * out)

    def xla_loss(q, k, v):
        out = _xla_attention(q, k, v, bias, SCALE)
        return jnp.sum(out * out)

    with interpret_mode(), tp.mesh_context(mesh):
        tp_grads = jax.jit(jax.grad(tp_loss, argnums=(0, 1, 2)))(q, k, v)
    xla_grads = jax.grad(xla_loss, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(tp_grads, xla_grads, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_dropout_kernel_tp_rate_plumbing(mesh):
    """rate>0 through the sharded path: the per-device seed offsets and the
    1/keep scaling must reproduce the single-device kernel (the simulator
    PRNG is all-zero-bits on every device, so masks agree by construction
    and any difference is a plumbing bug)."""
    rate = 0.5
    q, k, v, bias = _inputs(3)
    fn = lambda q, k, v, bias, seed: pallas_dropout_attention(  # noqa: E731
        q, k, v, bias, SCALE, rate, seed)
    with interpret_mode():
        single = jax.jit(lambda *a: fn(*a, 23))(q, k, v, bias)
        with tp.mesh_context(mesh):
            sharded = jax.jit(lambda *a: tp.shard_dropout_attention(
                fn, *a, 23))(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-6, atol=1e-6)
    # all-keep mask at rate .5 => exactly 2x the rate-0 output
    ref = _xla_attention(q, k, v, bias, SCALE) / (1.0 - rate)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
