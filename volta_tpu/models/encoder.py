"""The gated bimodal encoder — one Flax module, every VOLTA architecture.

Gating (which of the tt/tv/vt/vv attention flows and t/v feed-forwards exist
in a sublayer, whether parameters are shared across modalities, and whether
the residual LayerNorm couples the concatenated streams) is resolved at
*construction* from the static ``SublayerSpec`` plan, so the traced graph
contains no data-dependent control flow.

Semantics match the reference gated layers
(reference: volta/encoders.py:163-590, 820-888); the concat-softmax-split is
realised as a single joint attention over the concatenated KV axis (see
ops/attention.py for the equivalence).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from ..config import VoltaConfig, SublayerSpec
from ..ops import attention as attn_ops
from .layers import ACT2FN, LayerNorm, dense


def _dtype(cfg: VoltaConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _split_heads(x, num_heads):
    b, l, hd = x.shape
    return x.reshape(b, l, num_heads, hd // num_heads)


def _merge_heads(x):
    b, l, h, d = x.shape
    return x.reshape(b, l, h * d)


class GatedAttentionSublayer(nn.Module):
    """Joint QK^T-softmax-PV per enabled query stream + gated output block.

    reference: volta/encoders.py:163-449 (BertGatedSelfAttention +
    BertGatedSelfOutput + BertGatedAttention).
    """

    cfg: VoltaConfig
    spec: SublayerSpec

    def setup(self):
        cfg, spec = self.cfg, self.spec
        std = cfg.initializer_range
        dt = _dtype(cfg)
        if spec.has_text:
            self.query = dense(spec.attn_hidden_size, std, dt, "query")
            self.key = dense(spec.attn_hidden_size, std, dt, "key")
            self.value = dense(spec.attn_hidden_size, std, dt, "value")
            self.out_dense = dense(cfg.hidden_size, std, dt, "out_dense")
            self.out_ln = LayerNorm(cfg.hidden_size, use_pallas=cfg.use_pallas_layernorm,
                                    name="out_ln")
        if spec.has_vision and not spec.share_params:
            self.v_query = dense(spec.v_attn_hidden_size, std, dt, "v_query")
            self.v_key = dense(spec.v_attn_hidden_size, std, dt, "v_key")
            self.v_value = dense(spec.v_attn_hidden_size, std, dt, "v_value")
            self.v_out_dense = dense(cfg.v_hidden_size, std, dt, "v_out_dense")
            self.v_out_ln = LayerNorm(
                cfg.v_hidden_size, use_pallas=cfg.use_pallas_layernorm, name="v_out_ln")
        self.attn_drop = nn.Dropout(cfg.attention_probs_dropout_prob)
        self.v_attn_drop = nn.Dropout(cfg.v_attention_probs_dropout_prob)
        self.hidden_drop = nn.Dropout(cfg.hidden_dropout_prob)
        self.v_hidden_drop = nn.Dropout(cfg.v_hidden_dropout_prob)

    def _attend(self, q, ks, vs, biases, head_dim, drop, deterministic,
                want_probs, split_sizes):
        """Joint attention over the concatenated KV sources."""
        import jax

        k = ks[0] if len(ks) == 1 else jnp.concatenate(ks, axis=1)
        v = vs[0] if len(vs) == 1 else jnp.concatenate(vs, axis=1)
        bias = biases[0] if len(biases) == 1 else jnp.concatenate(biases, axis=-1)
        scale = 1.0 / math.sqrt(head_dim)
        dropping = not deterministic and drop.rate > 0.0
        if not dropping and not want_probs:
            out = attn_ops.fused_attention(
                q, k, v, bias, scale, use_pallas=self.cfg.use_pallas)
            return out, None
        if (dropping and not want_probs and self.cfg.use_pallas
                and bias is not None and q.shape[1] >= 8
                and jax.default_backend() == "tpu"):
            # fused attention with in-kernel dropout: the probability tensor
            # never reaches HBM in either direction
            from ..ops.pallas_attention import pallas_dropout_attention

            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max)
            return pallas_dropout_attention(
                q, k, v, bias, scale, float(drop.rate), seed), None
        probs = attn_ops.attention_probs(q, k, bias, scale)
        probs_kept = probs
        if dropping:
            probs_kept = drop(probs, deterministic=False)
        out = attn_ops.attention_out(probs_kept, v)
        if want_probs:
            splits = jnp.split(probs, [split_sizes[0]], axis=-1) \
                if len(split_sizes) == 2 else [probs]
            return out, splits
        return out, None

    @property
    def fully_fused(self) -> bool:
        """True when text+vision form one homogeneous stream: all four
        attention flows, shared parameters, single LayerNorm — i.e. the
        sublayer is standard self-attention over [text ‖ vision]."""
        s = self.spec
        return (s.has_tt and s.has_tv and s.has_vt and s.has_vv and
                s.share_params and s.single_ln)

    def fused(self, x, bias, *, deterministic: bool = True):
        """Single-stream path: one QKV, one attention, one output block over
        the concatenated sequence. Mathematically identical to __call__ for
        fully-fused sublayers (see test_fused_single_stream)."""
        spec = self.spec
        q = _split_heads(self.query(x), spec.num_heads)
        k = _split_heads(self.key(x), spec.num_heads)
        v = _split_heads(self.value(x), spec.num_heads)
        head_dim = spec.attn_hidden_size // spec.num_heads
        ctx, _ = self._attend(q, [k], [v], [bias], head_dim, self.attn_drop,
                              deterministic, False, [x.shape[1]])
        o = self.hidden_drop(self.out_dense(_merge_heads(ctx)),
                             deterministic=deterministic)
        return self.out_ln(o + x)

    def __call__(self, t, v, t_bias, v_bias, *, deterministic: bool = True,
                 output_probs: bool = False):
        spec = self.spec
        t_probs = v_probs = None

        if spec.has_text:
            qt = _split_heads(self.query(t), spec.num_heads)
            kt = _split_heads(self.key(t), spec.num_heads)
            vt = _split_heads(self.value(t), spec.num_heads)
        if spec.has_vision:
            vq_mod = self.query if spec.share_params else self.v_query
            vk_mod = self.key if spec.share_params else self.v_key
            vv_mod = self.value if spec.share_params else self.v_value
            qv = _split_heads(vq_mod(v), spec.v_num_heads)
            kv = _split_heads(vk_mod(v), spec.v_num_heads)
            vv = _split_heads(vv_mod(v), spec.v_num_heads)

        t_ctx = v_ctx = None
        if spec.has_text:
            ks, vs, bs, sizes = [], [], [], []
            if spec.has_tt:
                ks.append(kt); vs.append(vt); bs.append(t_bias)
                sizes.append(t.shape[1])
            if spec.has_tv:
                ks.append(kv); vs.append(vv); bs.append(v_bias)
                sizes.append(v.shape[1])
            head_dim = spec.attn_hidden_size // spec.num_heads
            t_ctx, t_probs = self._attend(
                qt, ks, vs, bs, head_dim, self.attn_drop, deterministic,
                output_probs, sizes)
            t_ctx = _merge_heads(t_ctx)
        if spec.has_vision:
            ks, vs, bs, sizes = [], [], [], []
            if spec.has_vt:
                ks.append(kt); vs.append(vt); bs.append(t_bias)
                sizes.append(t.shape[1])
            if spec.has_vv:
                ks.append(kv); vs.append(vv); bs.append(v_bias)
                sizes.append(v.shape[1])
            head_dim = spec.v_attn_hidden_size // spec.v_num_heads
            v_drop = self.attn_drop if spec.share_params else self.v_attn_drop
            v_ctx, v_probs = self._attend(
                qv, ks, vs, bs, head_dim, v_drop, deterministic,
                output_probs, sizes)
            v_ctx = _merge_heads(v_ctx)

        # Gated self-output: dense + dropout + residual + LayerNorm
        # (reference: volta/encoders.py:398-424).
        if spec.has_text:
            t_o = self.hidden_drop(self.out_dense(t_ctx),
                                   deterministic=deterministic)
        if spec.has_vision:
            od = self.out_dense if spec.share_params else self.v_out_dense
            hd = self.hidden_drop if spec.share_params else self.v_hidden_drop
            v_o = hd(od(v_ctx), deterministic=deterministic)

        if spec.single_ln:
            y = self.out_ln(jnp.concatenate([t_o + t, v_o + v], axis=1))
            t_new, v_new = y[:, :t.shape[1]], y[:, t.shape[1]:]
        else:
            t_new = self.out_ln(t_o + t) if spec.has_text else t
            if spec.has_vision:
                ln = self.out_ln if spec.share_params else self.v_out_ln
                v_new = ln(v_o + v)
            else:
                v_new = v
        if output_probs:
            return t_new, v_new, (t_probs, v_probs)
        return t_new, v_new, None


class GatedFeedForwardSublayer(nn.Module):
    """Gated per-modality FFN with sharing / single-LN coupling.

    reference: volta/encoders.py:452-590 (BertGatedIntermediate +
    BertGatedOutput + BertGatedFeedForward).
    """

    @property
    def fully_fused(self) -> bool:
        s = self.spec
        return s.has_t_ff and s.has_v_ff and s.share_params and s.single_ln

    def fused(self, x, *, deterministic: bool = True):
        act = ACT2FN[self.cfg.hidden_act]
        o = self.hidden_drop(self.out_dense(act(self.inter_dense(x))),
                             deterministic=deterministic)
        return self.out_ln(o + x)

    cfg: VoltaConfig
    spec: SublayerSpec

    def setup(self):
        cfg, spec = self.cfg, self.spec
        std = cfg.initializer_range
        dt = _dtype(cfg)
        if spec.has_t_ff:
            self.inter_dense = dense(spec.intermediate_size, std, dt, "inter_dense")
            self.out_dense = dense(cfg.hidden_size, std, dt, "out_dense")
            self.out_ln = LayerNorm(cfg.hidden_size, use_pallas=cfg.use_pallas_layernorm,
                                    name="out_ln")
        if spec.has_v_ff and not spec.share_params:
            self.v_inter_dense = dense(
                spec.v_intermediate_size, std, dt, "v_inter_dense")
            self.v_out_dense = dense(cfg.v_hidden_size, std, dt, "v_out_dense")
            self.v_out_ln = LayerNorm(
                cfg.v_hidden_size, use_pallas=cfg.use_pallas_layernorm, name="v_out_ln")
        self.hidden_drop = nn.Dropout(cfg.hidden_dropout_prob)
        self.v_hidden_drop = nn.Dropout(cfg.v_hidden_dropout_prob)

    def __call__(self, t, v, *, deterministic: bool = True):
        cfg, spec = self.cfg, self.spec
        act = ACT2FN[cfg.hidden_act]
        v_act = ACT2FN[cfg.hidden_act if spec.share_params else cfg.v_hidden_act]
        if spec.has_t_ff:
            t_h = act(self.inter_dense(t))
            t_o = self.hidden_drop(self.out_dense(t_h),
                                   deterministic=deterministic)
        if spec.has_v_ff:
            inter = self.inter_dense if spec.share_params else self.v_inter_dense
            outd = self.out_dense if spec.share_params else self.v_out_dense
            hd = self.hidden_drop if spec.share_params else self.v_hidden_drop
            v_o = hd(outd(v_act(inter(v))), deterministic=deterministic)

        if spec.single_ln:
            y = self.out_ln(jnp.concatenate([t_o + t, v_o + v], axis=1))
            return y[:, :t.shape[1]], y[:, t.shape[1]:]
        t_new = self.out_ln(t_o + t) if spec.has_t_ff else t
        if spec.has_v_ff:
            ln = self.out_ln if spec.share_params else self.v_out_ln
            v_new = ln(v_o + v)
        else:
            v_new = v
        return t_new, v_new


class GatedEncoder(nn.Module):
    """Depth-D stack dispatching attn vs ff per the static plan
    (reference: volta/encoders.py:820-888)."""

    cfg: VoltaConfig

    def setup(self):
        layers = []
        for spec in self.cfg.sublayer_plan():
            if spec.kind == "attn":
                layers.append(GatedAttentionSublayer(
                    self.cfg, spec, name=f"attn_{spec.index}"))
            else:
                layers.append(GatedFeedForwardSublayer(
                    self.cfg, spec, name=f"ff_{spec.index}"))
        self.sublayers = layers

    def __call__(self, t, v, t_bias, v_bias, *, deterministic: bool = True,
                 output_all_layers: bool = False, output_probs: bool = False):
        import jax

        # Single-stream fast path: when every sublayer is fully shared with
        # a single LN over [text ‖ vision] (UNITER / VisualBERT / VL-BERT
        # configs), the whole encoder is standard BERT over the concatenated
        # sequence — one QKV / attention / FFN per sublayer instead of two.
        if (not output_all_layers and not output_probs and
                all(l.fully_fused for l in self.sublayers)):
            x = jnp.concatenate([t, v], axis=1)
            bias = jnp.concatenate([t_bias, v_bias], axis=-1)
            for layer in self.sublayers:
                with jax.named_scope(layer.name):
                    if isinstance(layer, GatedAttentionSublayer):
                        x = layer.fused(x, bias, deterministic=deterministic)
                    else:
                        x = layer.fused(x, deterministic=deterministic)
            return x[:, : t.shape[1]], x[:, t.shape[1]:], ([], [], [])

        all_t, all_v, all_probs = [], [], []
        for layer in self.sublayers:
            with jax.named_scope(layer.name):
                if isinstance(layer, GatedAttentionSublayer):
                    t, v, probs = layer(t, v, t_bias, v_bias,
                                        deterministic=deterministic,
                                        output_probs=output_probs)
                    if output_probs:
                        all_probs.append(probs)
                else:
                    t, v = layer(t, v, deterministic=deterministic)
            if output_all_layers:
                all_t.append(t)
                all_v.append(v)
        return t, v, (all_t, all_v, all_probs)
