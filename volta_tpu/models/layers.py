"""Shared Flax building blocks: TF-style LayerNorm, activations, init.

Numerics notes:
  * LayerNorm is TF-style — epsilon inside the square root, eps=1e-12 —
    matching the reference (reference: volta/encoders.py:48-61 and apex
    fused_layer_norm). Statistics are always computed in float32 even when
    the surrounding compute dtype is bfloat16.
  * gelu is the exact erf formulation (reference: volta/encoders.py:130-136),
    not the tanh approximation.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

LN_EPS = 1e-12


# gelu dispatches on dtype (measured on v5e, tools/matmul_roofline.py +
# tools/perf_probe.py --variants base gelu_bf16 gelu_tanh):
#   * bf16 erf lowers ~4x slower than f32 erf (12 FFN-gelu epilogues at
#     [15360,3072]: 6.1 ms bf16-erf, 1.4 ms f32-erf sandwich, 0.3 ms tanh);
#   * in the full train step the tanh form is worth 3.1 ms (72.1 -> 69.1).
# Sub-f32 dtypes therefore use the original-BERT tanh approximation by
# default: its deviation from exact erf-gelu is <= 4.8e-4 absolute
# (peak at |x|~2.7), 33x SMALLER than the output perturbation caused by
# bf16 input rounding alone (1.6e-2) — i.e. below the dtype's own noise
# floor. Float32 always computes the exact erf form, so fp32 reference-
# parity numerics are untouched (reference: volta/encoders.py:130-136).
GELU_BF16_TANH = [True]  # sub-f32: tanh approximation (the 3.1 ms win)
GELU_UPCAST = [True]     # sub-f32 fallback when tanh is off: erf via f32


def gelu(x):
    if x.dtype in (jnp.bfloat16, jnp.float16):
        if GELU_BF16_TANH[0]:
            return jax.nn.gelu(x, approximate=True)
        if GELU_UPCAST[0]:
            u = x.astype(jnp.float32)
            return (u * 0.5 * (1.0 + jax.lax.erf(u * 2.0 ** -0.5))).astype(
                x.dtype)
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def gelu_tanh(x):
    """Original-BERT tanh gelu, in any dtype (the reference documents it
    at volta/encoders.py:130-134 but ships the erf form); selectable via
    config hidden_act for models trained with this formulation."""
    return jax.nn.gelu(x, approximate=True)


def swish(x):
    return x * jax.nn.sigmoid(x)


ACT2FN: dict[str, Callable] = {
    "gelu": gelu,
    "gelu_tanh": gelu_tanh,
    "relu": jax.nn.relu,
    "swish": swish,
}


def layer_norm_ref(x, scale, bias, eps: float = LN_EPS):
    """Plain-XLA layernorm; fp32 statistics, output in x.dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


class LayerNorm(nn.Module):
    """TF-style layernorm with learnable scale/bias.

    ``use_pallas`` switches the plain path to the fused Pallas LN kernel on
    TPU; ``fused_residual`` enables the fused dropout+residual+LN train
    kernel for the residual-mode call (set from config; both fall back to
    XLA off-TPU or at unsupported shapes).

    Residual mode — ``ln(o, residual=x, drop_rate=p, deterministic=d)`` —
    computes ``LN(dropout(o) + x)``, the tail of every encoder sublayer
    (reference: volta/encoders.py:398-424). On the TPU train path this is
    one fused kernel per direction (ops/fused_residual.py); elsewhere it is
    the reference composition (bit-identical in deterministic mode to the
    previous Dropout-module + add + LN formulation).
    """

    dim: int
    eps: float = LN_EPS
    use_pallas: bool = False
    fused_residual: bool = False
    pallas_mask: bool = False
    hash_mask: bool = False

    def setup(self):
        # setup-style (not @nn.compact) so sibling modules can read the
        # affine params for the fused dual-stream chain (encoder.py) —
        # param names/paths are unchanged.
        self.scale = self.param("scale", nn.initializers.ones, (self.dim,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.dim,))

    def __call__(self, x, residual=None, *, drop_rate: float = 0.0,
                 deterministic: bool = True, keep_mask=None):
        scale, bias = self.scale, self.bias
        if residual is None:
            if self.use_pallas:
                from ..ops.layernorm import fused_layer_norm
                return fused_layer_norm(x, scale, bias, eps=self.eps)
            return layer_norm_ref(x, scale, bias, eps=self.eps)

        # branch precedence: an explicit keep_mask (drawn inside the
        # attention kernel), then the pallas_mask / fused_residual opt-ins,
        # then the hash-dropout default, then the XLA-RNG fallback — the
        # opt-ins must stay reachable while hash_mask defaults on
        dropping = (not deterministic) and drop_rate > 0.0
        dropped = False
        if dropping and not dropped and keep_mask is None \
                and self.pallas_mask:
            # Mosaic hardware PRNG writes the keep mask (no materialised
            # uint32 bits tensor); the apply below stays in XLA's fusion
            from ..ops import dropout_mask as dm
            from ..parallel import tp

            if dm.kernels_enabled() and tp.current_mesh() is None \
                    and dm.supported(x.shape):
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max)
                keep_mask = dm.pallas_keep_mask(x.shape, drop_rate, seed)
        if dropping and keep_mask is not None:
            # precomputed 0/1 keep mask (drawn inside the attention kernel,
            # see ops/pallas_attention.pallas_dropout_attention_hm): apply
            # is one fused elementwise op, no RNG pass here
            x = jnp.where(keep_mask > 0, x / (1.0 - drop_rate),
                          jnp.zeros((), x.dtype))
            dropped = True
        elif dropping and not dropped and self.fused_residual and \
                jax.default_backend() == "tpu":
            from ..ops import fused_residual as fr
            from ..parallel import tp

            mesh = tp.current_mesh()
            if fr.supported(x) and (mesh is None or
                                    tp.shardable_rows(mesh, x)):
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max)
                return tp.shard_residual_ln(
                    lambda o, r, sc, b, s: fr.dropout_residual_ln(
                        o, r, sc, b, s, drop_rate, self.eps),
                    x, residual, scale, bias, seed)
        if dropping and not dropped and self.hash_mask:
            # counter-based draw: zero HBM traffic, rematerialised in bwd
            x = hash_dropout(x, self.make_rng("dropout"), drop_rate)
            dropped = True
        if dropping and not dropped:
            x = int_threshold_dropout(x, self.make_rng("dropout"),
                                      drop_rate)
        s = x + residual
        if self.use_pallas:
            from ..ops.layernorm import fused_layer_norm
            return fused_layer_norm(s, scale, bias, eps=self.eps)
        return layer_norm_ref(s, scale, bias, eps=self.eps)


def residual_ln_seg(o, res, scale_t, bias_t, scale_v, bias_v, lt: int, *,
                    rate: float, rng, deterministic: bool, hash_mask: bool,
                    eps: float = LN_EPS):
    """One dropout+residual+LayerNorm chain over a [text ‖ vision]
    concatenated sequence whose two segments own *different* LN affines.

    LayerNorm statistics are per-token, so normalising the concatenated
    tensor is bit-identical to normalising each stream separately; the
    per-stream scale/bias are applied as a per-position affine built by
    broadcast+concat (constant-shaped, fused by XLA into the same
    elementwise loop). This halves the number of short elementwise chains
    in dual-stream sublayers (reference semantics:
    volta/encoders.py:398-424 per stream)."""
    if (not deterministic) and rate > 0.0:
        o = hash_dropout(o, rng, rate) if hash_mask else \
            int_threshold_dropout(o, rng, rate)
    s = o + res
    dtype = s.dtype
    x32 = s.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    dim = s.shape[-1]
    lv = s.shape[-2] - lt
    cat = lambda a, b: jnp.concatenate(
        [jnp.broadcast_to(a.astype(jnp.float32), (lt, dim)),
         jnp.broadcast_to(b.astype(jnp.float32), (lv, dim))], axis=0)
    y = y * cat(scale_t, scale_v) + cat(bias_t, bias_v)
    return y.astype(dtype)


def int_threshold_dropout(x, key, rate: float):
    """Dropout via a raw-bits integer compare: same Bernoulli(1-rate)
    distribution as jax.random.bernoulli (up to 2^-32 threshold rounding)
    without the bits->float conversion chain, so the fused RNG epilogue is
    a draw + one compare."""
    bits = jax.random.bits(key, x.shape, jnp.uint32)
    keep = bits < jnp.uint32((1.0 - rate) * 4294967295.0)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


def _fmix32(h):
    """murmur3 finalizer: full-avalanche 32-bit mixer (public domain)."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def hash_dropout(x, key, rate: float):
    """Counter-based dropout: keep bit = fmix32(position * golden + seed)
    < threshold. The mask is a pure function of (iota, seed), so XLA fuses
    the whole draw into the surrounding epilogue and rematerialises it in
    the backward — no RNG bits tensor, no saved mask, zero HBM traffic.
    Measured on v5e (b256 VQA step): 88.2 ms vs 92.3 ms RngBitGenerator
    bernoulli / 91.4 ms Pallas mask kernel. Same Bernoulli(1-rate)
    marginal; independence comes from the full-avalanche mixer over
    distinct counters (the construction of counter-based PRNGs à la
    Philox, with a cheaper mixer — amply white for dropout).

    Whiteness was re-audited after a marginal overfit proxy regressed on
    switching to this path: keep fraction, cross-site/cross-draw agreement
    (0.8202 vs 0.8200 iid expectation), shifted-window agreement, per-site
    keep rates inside the real jitted train step, and a residual-LN toy
    memorization all match iid Bernoulli; the proxy regression reproduced
    with plain RngBitGenerator dropout under a shifted key stream (scores
    1.0/0.86/0.50 across three realizations), i.e. it was seed-luck on a
    shortcut-basin task, not a defect here (see tools/accuracy_proxies.py
    qa_proxy for the de-flaked task layout)."""
    seed = jax.random.bits(key, (), jnp.uint32)
    lin = jnp.zeros(x.shape, jnp.uint32)
    mult = 1
    for axis in range(x.ndim - 1, -1, -1):
        lin = lin + jax.lax.broadcasted_iota(
            jnp.uint32, x.shape, axis) * jnp.uint32(mult)
        mult *= x.shape[axis]
    h = _fmix32(lin * jnp.uint32(0x9E3779B9) + seed)
    keep = h < jnp.uint32((1.0 - rate) * 4294967295.0)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


def dense(features: int, stddev: float, dtype, name: str) -> nn.Dense:
    """Linear layer with the reference's init: N(0, initializer_range) kernel,
    zero bias (reference: volta/encoders.py:904-915)."""
    return nn.Dense(
        features,
        kernel_init=nn.initializers.normal(stddev=stddev),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def embed(num: int, features: int, stddev: float, name: str,
          zero_pad_row: bool = False) -> nn.Embed:
    """Embedding table with N(0, stddev) init; optionally zero row 0 to match
    torch's padding_idx=0 initialisation."""
    base = nn.initializers.normal(stddev=stddev)

    def init(key, shape, dtype=jnp.float32):
        table = base(key, shape, dtype)
        if zero_pad_row:
            table = table.at[0].set(0.0)
        return table

    return nn.Embed(num, features, embedding_init=init,
                    param_dtype=jnp.float32, name=name)
