"""Pallas fused joint-softmax attention kernel for TPU.

TPU-native counterpart of apex's fused multihead-attention CUDA kernels
(reference: apex/apex/contrib/csrc/multihead_attn/) specialised to VOLTA's
gated bimodal attention: the query stream attends over the concatenated
[text ‖ vision] key/value axis with a joint softmax
(reference: volta/encoders.py:285-314).

Sequence lengths here are short (≤ ~128 query, ≤ ~256 joint key), so the
whole (Lq, Lk) score tile lives in VMEM — no online-softmax streaming needed.
The grid walks (batch-tile, head); each program does QK^T, bias add, softmax
and PV in one VMEM round trip, eliminating the HBM materialisation of the
[B, H, Lq, Lk] probability tensor that the XLA path incurs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    # blocks: q [1, bb, Lq, D], k/v [1, bb, Lk, D], bias [bb, 1, Lk] (one head)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [bb, Lq, Lk]
    scores = scores * scale + bias_ref[:].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [bb, Lq, D]
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_fused_attention(q, k, v, bias, scale):
    """q [B,Lq,H,D], k/v [B,Lk,H,D], bias [B,1,1,Lk] -> [B,Lq,H,D].

    Forward runs the Pallas kernel; backward recomputes the standard
    attention VJP with XLA ops (cheap at these lengths, keeps the kernel
    forward-only)."""
    return _pallas_forward(q, k, v, bias, scale)


def _attn_fwd(q, k, v, bias, scale):
    return _pallas_forward(q, k, v, bias, scale), (q, k, v, bias)


def _attn_bwd(scale, res, g):
    q, k, v, bias = res
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
    scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", probs, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf) * scale
    # bias is [B,1,1,Lk]: reduce heads and query positions
    dbias = jnp.sum(ds, axis=(1, 2))[:, None, None, :]
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype))


pallas_fused_attention.defvjp(_attn_fwd, _attn_bwd)


def _pallas_forward(q, k, v, bias, scale, *, batch_tile: int = 16):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    if b % batch_tile != 0:
        batch_tile = 1 if b % 8 else 8
        if b % batch_tile:
            raise NotImplementedError("odd batch for pallas attention")
    # head-major layout for per-head grid walks
    qh = jnp.transpose(q, (2, 0, 1, 3))  # [H, B, Lq, D]
    kh = jnp.transpose(k, (2, 0, 1, 3))
    vh = jnp.transpose(v, (2, 0, 1, 3))
    bias_b = jnp.broadcast_to(bias.astype(jnp.float32), (b, 1, 1, lk))
    bias_b = bias_b.reshape(b, 1, lk)

    grid = (h, b // batch_tile)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, batch_tile, lq, d), lambda hi, bi: (hi, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch_tile, lk, d), lambda hi, bi: (hi, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch_tile, lk, d), lambda hi, bi: (hi, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, 1, lk), lambda hi, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, batch_tile, lq, d), lambda hi, bi: (hi, bi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, b, lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq * lk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
    )(qh, kh, vh, bias_b)
    return jnp.transpose(out, (1, 2, 0, 3))  # back to [B, Lq, H, D]
