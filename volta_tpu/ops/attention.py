"""Bimodal joint attention — the framework's innermost hot op.

The reference computes up to four attention flows (tt/tv/vt/vv), concatenates
intra- and inter-modal scores, softmaxes jointly, splits, and runs two PV
matmuls per stream (reference: volta/encoders.py:258-340). That is
mathematically a *single* attention over the concatenated [text ‖ vision]
key/value axis:

    softmax([S_tt ‖ S_tv]) @ [V_t ; V_v]  ==  P_tt @ V_t + P_tv @ V_v

so we implement it as one fused attention per query stream, which maps
directly onto the MXU: one QK^T matmul, one joint softmax, one PV matmul.

Layout convention: q/k/v are [B, L, H, D]; additive bias is [B, 1, 1, Lk]
(0 for live keys, -10000 for padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_scores(q, k, bias, scale):
    """Raw joint scores [B, H, Lq, Lk] in float32."""
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * jnp.float32(scale)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    return scores


def attention_probs(q, k, bias, scale):
    """Joint softmax over the concatenated key axis, float32."""
    return jax.nn.softmax(attention_scores(q, k, bias, scale), axis=-1)


def attention_out(probs, v):
    """[B,H,Lq,Lk] x [B,Lk,H,D] -> [B,Lq,H,D] in v.dtype."""
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def _xla_fused_attention(q, k, v, bias, scale):
    probs = attention_probs(q, k, bias, scale)
    return attention_out(probs, v)


def fused_attention(q, k, v, bias, scale, *, use_pallas: bool = True,
                    natural: bool = False):
    """One-shot attention (no probs materialised for the caller).

    On TPU with ``use_pallas`` the Pallas kernel fuses QK^T + joint softmax +
    PV in VMEM; elsewhere falls back to the XLA composition (which XLA also
    fuses well at these shapes). ``natural`` selects the zero-layout-copy
    [B,L,H,D] kernel variant.
    """
    if use_pallas and bias is not None and q.shape[1] >= 8:
        from .pallas_attention import (kernels_enabled,
                                       pallas_fused_attention,
                                       pallas_fused_attention_nat)
        if not kernels_enabled():
            return _xla_fused_attention(q, k, v, bias, scale)
        kern = pallas_fused_attention_nat if natural \
            else pallas_fused_attention
        from ..parallel import tp

        mesh = tp.current_mesh()
        try:
            if mesh is None:
                return kern(q, k, v, bias, scale)
            if tp.shardable(mesh, q):
                return tp.shard_attention(
                    lambda q, k, v, b: kern(q, k, v, b, scale),
                    q, k, v, bias)
        except NotImplementedError:
            pass
    return _xla_fused_attention(q, k, v, bias, scale)


def additive_mask(mask, dtype=jnp.float32):
    """[B, L] 1/0 mask -> [B, 1, 1, L] additive bias with -10000 on pads
    (reference: volta/encoders.py:974-991)."""
    m = mask.astype(dtype)
    return ((1.0 - m) * -10000.0)[:, None, None, :]
