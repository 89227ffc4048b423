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
from .layers import ACT2FN, LayerNorm, dense, residual_ln_seg


def _dtype(cfg: VoltaConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _make_ln(cfg: VoltaConfig, dim: int, name: str) -> LayerNorm:
    """Residual-capable LayerNorm: the fused dropout+residual+LN train
    kernel rides the same ``use_pallas`` gate as the attention kernels."""
    return LayerNorm(dim, use_pallas=cfg.use_pallas_layernorm,
                     fused_residual=cfg.use_pallas and
                     cfg.use_fused_residual_ln,
                     pallas_mask=cfg.use_pallas and
                     cfg.use_pallas_dropout_mask and not cfg.remat_ff,
                     hash_mask=cfg.use_hash_dropout, name=name)


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
            self.out_ln = _make_ln(cfg, cfg.hidden_size, "out_ln")
        if spec.has_vision and not spec.share_params:
            self.v_query = dense(spec.v_attn_hidden_size, std, dt, "v_query")
            self.v_key = dense(spec.v_attn_hidden_size, std, dt, "v_key")
            self.v_value = dense(spec.v_attn_hidden_size, std, dt, "v_value")
            self.v_out_dense = dense(cfg.v_hidden_size, std, dt, "v_out_dense")
            self.v_out_ln = _make_ln(cfg, cfg.v_hidden_size, "v_out_ln")
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
                q, k, v, bias, scale, use_pallas=self.cfg.use_pallas,
                natural=self.cfg.attn_natural_layout)
            return out, None
        from ..ops.pallas_attention import kernels_enabled
        if (dropping and not want_probs and self.cfg.use_pallas
                and bias is not None and q.shape[1] >= 8
                and kernels_enabled()):
            # fused attention with in-kernel dropout: the probability tensor
            # never reaches HBM in either direction
            from ..ops.pallas_attention import pallas_dropout_attention
            from ..parallel import tp

            mesh = tp.current_mesh()
            if mesh is None or tp.shardable(mesh, q):
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max)
                rate = float(drop.rate)
                nat = self.cfg.attn_natural_layout
                return tp.shard_dropout_attention(
                    lambda q, k, v, b, s: pallas_dropout_attention(
                        q, k, v, b, scale, rate, s, natural=nat),
                    q, k, v, bias, seed), None
        probs = attn_ops.attention_probs(q, k, bias, scale)
        probs_kept = probs
        if dropping:
            probs_kept = drop(probs, deterministic=False)
        out = attn_ops.attention_out(probs_kept, v)
        if want_probs:
            # post-dropout, like the reference's captured tensors
            # (volta/encoders.py:288-314; identical to pre-dropout in eval)
            splits = jnp.split(probs_kept, [split_sizes[0]], axis=-1) \
                if len(split_sizes) == 2 else [probs_kept]
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

    def fused(self, x, bias, *, deterministic: bool = True,
              want_ffn_mask: bool = False):
        """Single-stream path: one QKV, one attention, one output block over
        the concatenated sequence. Mathematically identical to __call__ for
        fully-fused sublayers (see test_fused_single_stream).

        With ``want_ffn_mask`` the return is ``(y, ffn_keep_mask)``: when
        the in-kernel-dropout attention kernel runs, it also draws the
        hidden-dropout keep masks for this sublayer's output and for the
        following feed-forward (cfg.fuse_hidden_dropout) — two fewer XLA
        RNG passes per layer; the FFN mask is handed to the next sublayer
        by the encoder loop."""
        import jax

        spec, cfg = self.spec, self.cfg
        q = _split_heads(self.query(x), spec.num_heads)
        k = _split_heads(self.key(x), spec.num_heads)
        v = _split_heads(self.value(x), spec.num_heads)
        head_dim = spec.attn_hidden_size // spec.num_heads
        h_rate = cfg.hidden_dropout_prob
        ctx = hm0 = ffn_mask = None
        if (not deterministic and h_rate > 0.0 and self.attn_drop.rate > 0.0
                and cfg.use_pallas and cfg.fuse_hidden_dropout
                and bias is not None and x.shape[1] >= 8
                and spec.attn_hidden_size == cfg.hidden_size):
            from ..ops.pallas_attention import kernels_enabled
            from ..parallel import tp

            if kernels_enabled() and tp.current_mesh() is None:
                from ..ops.pallas_attention import \
                    pallas_dropout_attention_hm

                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max)
                ctx, hm0, ffn_mask = pallas_dropout_attention_hm(
                    q, k, v, bias, 1.0 / math.sqrt(head_dim),
                    float(self.attn_drop.rate), float(h_rate), seed)
        if ctx is None:
            ctx, _ = self._attend(q, [k], [v], [bias], head_dim,
                                  self.attn_drop, deterministic, False,
                                  [x.shape[1]])
        y = self.out_ln(self.out_dense(_merge_heads(ctx)), residual=x,
                        drop_rate=h_rate, deterministic=deterministic,
                        keep_mask=hm0)
        if want_ffn_mask:
            return y, ffn_mask
        return y

    def _dual_fusable(self, output_probs: bool) -> bool:
        """Dual-stream tail fusion (cfg.fuse_dual_stream): one concatenated
        dropout+residual+LN chain — and, for parameter-shared sublayers, one
        QKV / output projection — instead of two per-stream ones."""
        spec, cfg = self.spec, self.cfg
        if not (cfg.fuse_dual_stream and spec.has_text and spec.has_vision
                and not spec.single_ln and not output_probs):
            return False
        if cfg.hidden_size != cfg.v_hidden_size:
            return False
        if spec.share_params:
            return spec.attn_hidden_size == spec.v_attn_hidden_size
        # the segmented chain bypasses the LN-internal kernel opt-ins and
        # shares one mask draw; keep those paths reachable / rates sane
        if cfg.use_pallas_layernorm or cfg.use_fused_residual_ln \
                or cfg.use_pallas_dropout_mask:
            return False
        return cfg.hidden_dropout_prob == cfg.v_hidden_dropout_prob

    def __call__(self, t, v, t_bias, v_bias, *, deterministic: bool = True,
                 output_probs: bool = False):
        spec = self.spec
        t_probs = v_probs = None
        qt = kt = qv = kv = None
        lt = t.shape[1]
        fuse_dual = self._dual_fusable(output_probs)

        if fuse_dual and spec.share_params and self.cfg.fuse_dual_qkv:
            # shared weights: one QKV matmul over [text ‖ vision] replaces
            # the two per-stream applications of the same Linear
            # (reference runs it twice, volta/encoders.py:258-281)
            x = jnp.concatenate([t, v], axis=1)
            q_all, k_all, v_all = self.query(x), self.key(x), self.value(x)
            qt = _split_heads(q_all[:, :lt], spec.num_heads)
            kt = _split_heads(k_all[:, :lt], spec.num_heads)
            vt = _split_heads(v_all[:, :lt], spec.num_heads)
            qv = _split_heads(q_all[:, lt:], spec.v_num_heads)
            kv = _split_heads(k_all[:, lt:], spec.v_num_heads)
            vv = _split_heads(v_all[:, lt:], spec.v_num_heads)
        else:
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
        # (reference: volta/encoders.py:398-424), as residual-mode LN calls
        # so the TPU train path fuses the whole chain into one kernel.
        cfg = self.cfg
        t_rate = cfg.hidden_dropout_prob
        v_rate = cfg.hidden_dropout_prob if spec.share_params \
            else cfg.v_hidden_dropout_prob
        if fuse_dual:
            r = jnp.concatenate([t, v], axis=1)
            if spec.share_params:
                # shared output projection + shared LN: the plain residual-
                # mode LN call on the concatenated sequence is bit-equal to
                # two per-stream calls (per-token statistics)
                o = self.out_dense(jnp.concatenate([t_ctx, v_ctx], axis=1))
                y = self.out_ln(o, residual=r, drop_rate=t_rate,
                                deterministic=deterministic)
            else:
                o = jnp.concatenate(
                    [self.out_dense(t_ctx), self.v_out_dense(v_ctx)], axis=1)
                rng = self.make_rng("dropout") \
                    if (not deterministic and t_rate > 0.0) else None
                y = residual_ln_seg(
                    o, r, self.out_ln.scale, self.out_ln.bias,
                    self.v_out_ln.scale, self.v_out_ln.bias, lt,
                    rate=t_rate, rng=rng, deterministic=deterministic,
                    hash_mask=cfg.use_hash_dropout, eps=self.out_ln.eps)
            return y[:, :lt], y[:, lt:], None
        if spec.has_text:
            t_o = self.out_dense(t_ctx)
        if spec.has_vision:
            od = self.out_dense if spec.share_params else self.v_out_dense
            v_o = od(v_ctx)

        if spec.single_ln:
            if t_rate == v_rate:
                y = self.out_ln(jnp.concatenate([t_o, v_o], axis=1),
                                residual=jnp.concatenate([t, v], axis=1),
                                drop_rate=t_rate,
                                deterministic=deterministic)
            else:  # distinct rates cannot share one mask draw
                t_d = self.hidden_drop(t_o, deterministic=deterministic)
                v_d = self.v_hidden_drop(v_o, deterministic=deterministic)
                y = self.out_ln(jnp.concatenate([t_d + t, v_d + v], axis=1))
            t_new, v_new = y[:, :t.shape[1]], y[:, t.shape[1]:]
        else:
            t_new = self.out_ln(
                t_o, residual=t, drop_rate=t_rate,
                deterministic=deterministic) if spec.has_text else t
            if spec.has_vision:
                ln = self.out_ln if spec.share_params else self.v_out_ln
                v_new = ln(v_o, residual=v, drop_rate=v_rate,
                           deterministic=deterministic)
            else:
                v_new = v
        if output_probs:
            return t_new, v_new, self._attn_data(qt, kt, t_probs, qv, kv,
                                                 v_probs)
        return t_new, v_new, None

    def _attn_data(self, qt, kt, t_probs, qv, kv, v_probs):
        """Per-stream visualization dicts, reference layout
        (volta/encoders.py:342-358): probs [B, H, Lq, Lk], queries/keys
        [B, H, L, head_dim]; None for absent flows/streams. The vision
        joint-softmax key order is [text ‖ vision], so when both vt and vv
        exist the splits arrive as (vt, vv)."""
        spec = self.spec
        bhld = lambda x: None if x is None else x.transpose(0, 2, 1, 3)
        tt = tv = vt = vv = None
        if spec.has_text:
            if spec.has_tt and spec.has_tv:
                tt, tv = t_probs
            elif spec.has_tt:
                (tt,) = t_probs
            else:
                (tv,) = t_probs
        if spec.has_vision:
            if spec.has_vt and spec.has_vv:
                vt, vv = v_probs
            elif spec.has_vt:
                (vt,) = v_probs
            else:
                (vv,) = v_probs
        # like the reference, a stream with no flows still gets a dict of
        # Nones (volta/encoders.py:342-358 builds both unconditionally)
        t_data = {"intra_attn": tt, "inter_attn": tv,
                  "queries": bhld(qt), "keys": bhld(kt)}
        v_data = {"intra_attn": vv, "inter_attn": vt,
                  "queries": bhld(qv), "keys": bhld(kv)}
        return t_data, v_data


class GatedFeedForwardSublayer(nn.Module):
    """Gated per-modality FFN with sharing / single-LN coupling.

    reference: volta/encoders.py:452-590 (BertGatedIntermediate +
    BertGatedOutput + BertGatedFeedForward).
    """

    @property
    def fully_fused(self) -> bool:
        s = self.spec
        return s.has_t_ff and s.has_v_ff and s.share_params and s.single_ln

    def fused(self, x, *, deterministic: bool = True, keep_mask=None):
        act = ACT2FN[self.cfg.hidden_act]
        return self.out_ln(self.out_dense(act(self.inter_dense(x))),
                           residual=x,
                           drop_rate=self.cfg.hidden_dropout_prob,
                           deterministic=deterministic,
                           keep_mask=keep_mask)

    cfg: VoltaConfig
    spec: SublayerSpec

    def setup(self):
        cfg, spec = self.cfg, self.spec
        std = cfg.initializer_range
        dt = _dtype(cfg)
        if spec.has_t_ff:
            self.inter_dense = dense(spec.intermediate_size, std, dt, "inter_dense")
            self.out_dense = dense(cfg.hidden_size, std, dt, "out_dense")
            self.out_ln = _make_ln(cfg, cfg.hidden_size, "out_ln")
        if spec.has_v_ff and not spec.share_params:
            self.v_inter_dense = dense(
                spec.v_intermediate_size, std, dt, "v_inter_dense")
            self.v_out_dense = dense(cfg.v_hidden_size, std, dt, "v_out_dense")
            self.v_out_ln = _make_ln(cfg, cfg.v_hidden_size, "v_out_ln")
        self.hidden_drop = nn.Dropout(cfg.hidden_dropout_prob)
        self.v_hidden_drop = nn.Dropout(cfg.v_hidden_dropout_prob)

    def _dual_fusable(self) -> bool:
        """Same fusion decision as GatedAttentionSublayer._dual_fusable,
        for the feed-forward tail."""
        spec, cfg = self.spec, self.cfg
        if not (cfg.fuse_dual_stream and spec.has_t_ff and spec.has_v_ff
                and not spec.single_ln):
            return False
        if cfg.hidden_size != cfg.v_hidden_size:
            return False
        if spec.share_params:
            return True
        if cfg.use_pallas_layernorm or cfg.use_fused_residual_ln \
                or cfg.use_pallas_dropout_mask:
            return False
        return cfg.hidden_dropout_prob == cfg.v_hidden_dropout_prob

    def __call__(self, t, v, *, deterministic: bool = True):
        cfg, spec = self.cfg, self.spec
        act = ACT2FN[cfg.hidden_act]
        v_act = ACT2FN[cfg.hidden_act if spec.share_params else cfg.v_hidden_act]
        t_rate = cfg.hidden_dropout_prob
        v_rate = cfg.hidden_dropout_prob if spec.share_params \
            else cfg.v_hidden_dropout_prob
        lt = t.shape[1]
        if self._dual_fusable():
            if spec.share_params:
                # shared FFN + shared LN: whole sublayer over [text ‖ vision]
                x = jnp.concatenate([t, v], axis=1)
                y = self.out_ln(self.out_dense(act(self.inter_dense(x))),
                                residual=x, drop_rate=t_rate,
                                deterministic=deterministic)
            else:
                o = jnp.concatenate(
                    [self.out_dense(act(self.inter_dense(t))),
                     self.v_out_dense(v_act(self.v_inter_dense(v)))], axis=1)
                rng = self.make_rng("dropout") \
                    if (not deterministic and t_rate > 0.0) else None
                y = residual_ln_seg(
                    o, jnp.concatenate([t, v], axis=1),
                    self.out_ln.scale, self.out_ln.bias,
                    self.v_out_ln.scale, self.v_out_ln.bias, lt,
                    rate=t_rate, rng=rng, deterministic=deterministic,
                    hash_mask=cfg.use_hash_dropout, eps=self.out_ln.eps)
            return y[:, :lt], y[:, lt:]
        if spec.has_t_ff:
            t_o = self.out_dense(act(self.inter_dense(t)))
        if spec.has_v_ff:
            inter = self.inter_dense if spec.share_params else self.v_inter_dense
            outd = self.out_dense if spec.share_params else self.v_out_dense
            v_o = outd(v_act(inter(v)))

        if spec.single_ln:
            if t_rate == v_rate:
                y = self.out_ln(jnp.concatenate([t_o, v_o], axis=1),
                                residual=jnp.concatenate([t, v], axis=1),
                                drop_rate=t_rate,
                                deterministic=deterministic)
            else:
                t_d = self.hidden_drop(t_o, deterministic=deterministic)
                v_d = self.v_hidden_drop(v_o, deterministic=deterministic)
                y = self.out_ln(jnp.concatenate([t_d + t, v_d + v], axis=1))
            return y[:, :t.shape[1]], y[:, t.shape[1]:]
        t_new = self.out_ln(
            t_o, residual=t, drop_rate=t_rate,
            deterministic=deterministic) if spec.has_t_ff else t
        if spec.has_v_ff:
            ln = self.out_ln if spec.share_params else self.v_out_ln
            v_new = ln(v_o, residual=v, drop_rate=v_rate,
                       deterministic=deterministic)
        else:
            v_new = v
        return t_new, v_new


# --------------------------------------------------------------------------
# Pure-function twins of the fused sublayers, used by the scan path: the
# single-stream encoder is a homogeneous stack, so scanning one compiled
# block over stacked per-layer params cuts compile time ~depth-fold.
# Deterministic-mode outputs are identical to the module path
# (tests/test_fused_single_stream.py).
def _dense_p(p, x, dt):
    return x.astype(dt) @ p["kernel"].astype(dt) + p["bias"].astype(dt)


def _ln_p(p, x):
    from .layers import layer_norm_ref

    return layer_norm_ref(x, p["scale"], p["bias"])


def _dropout(x, key, rate, deterministic):
    import jax

    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0)


def _fused_attn_block(p, x, bias, seed, hkeys, *, cfg, num_heads, head_dim,
                      deterministic):
    import jax

    from ..ops.pallas_attention import kernels_enabled
    from ..parallel import tp

    dt = _dtype(cfg)
    # one merged QKV matmul (better MXU utilisation than 3 separate)
    kernel = jnp.concatenate(
        [p[n]["kernel"].astype(dt) for n in ("query", "key", "value")], 1)
    b = jnp.concatenate(
        [p[n]["bias"].astype(dt) for n in ("query", "key", "value")])
    qkv = x.astype(dt) @ kernel + b
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(y, num_heads) for y in (q, k, v))
    scale = 1.0 / math.sqrt(head_dim)
    rate = cfg.attention_probs_dropout_prob
    if deterministic or rate == 0.0:
        ctx = attn_ops.fused_attention(q, k, v, bias, scale,
                                       use_pallas=cfg.use_pallas,
                                       natural=cfg.attn_natural_layout)
    elif cfg.use_pallas and kernels_enabled() and (
            tp.current_mesh() is None or tp.shardable(tp.current_mesh(), q)):
        from ..ops.pallas_attention import pallas_dropout_attention

        ctx = tp.shard_dropout_attention(
            lambda q, k, v, b, s: pallas_dropout_attention(
                q, k, v, b, scale, float(rate), s,
                natural=cfg.attn_natural_layout),
            q, k, v, bias, seed)
    else:
        probs = attn_ops.attention_probs(q, k, bias, scale)
        probs = _dropout(probs, hkeys[0], rate, deterministic)
        ctx = attn_ops.attention_out(probs, v)
    o = _dense_p(p["out_dense"], _merge_heads(ctx), dt)
    o = _dropout(o, hkeys[1], cfg.hidden_dropout_prob, deterministic)
    return _ln_p(p["out_ln"], o + x.astype(dt))


def _fused_ff_block(p, x, hkey, *, cfg, deterministic):
    dt = _dtype(cfg)
    h = ACT2FN[cfg.hidden_act](_dense_p(p["inter_dense"], x, dt))
    o = _dense_p(p["out_dense"], h, dt)
    o = _dropout(o, hkey, cfg.hidden_dropout_prob, deterministic)
    return _ln_p(p["out_ln"], o + x.astype(dt))


def _ff_fused_call(layer, x, keep_mask, deterministic):
    return layer.fused(x, deterministic=deterministic, keep_mask=keep_mask)


def _ff_dual_call(layer, t, v, deterministic):
    return layer(t, v, deterministic=deterministic)


# FF sublayers recomputed in the backward instead of saving the [B, L, 4H]
# activations (cfg.remat_ff). Attention sublayers are never rematted: the
# in-kernel-dropout Pallas kernel's Mosaic PRNG is not reproducible across
# recompilations (see CLAUDE.md), so recompute would decorrelate the mask.
_ff_fused_remat = nn.remat(_ff_fused_call, static_argnums=(3,))
_ff_dual_remat = nn.remat(_ff_dual_call, static_argnums=(3,))


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
            if self._scannable() and not self.is_initializing():
                x = self._scan_fused(x, bias, deterministic)
            else:
                ffn_mask = None
                for layer in self.sublayers:
                    with jax.named_scope(layer.name):
                        if isinstance(layer, GatedAttentionSublayer):
                            x, ffn_mask = layer.fused(
                                x, bias, deterministic=deterministic,
                                want_ffn_mask=True)
                        elif self.cfg.remat_ff:
                            # remat recomputes the FF in the backward; the
                            # kernel-drawn mask is a remat input so the
                            # forward/backward draws stay identical
                            x = _ff_fused_remat(layer, x, ffn_mask,
                                                deterministic)
                            ffn_mask = None  # one draw per FF sublayer
                        else:
                            x = layer.fused(x, deterministic=deterministic,
                                            keep_mask=ffn_mask)
                            ffn_mask = None  # one draw per FF sublayer
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
                elif self.cfg.remat_ff:
                    t, v = _ff_dual_remat(layer, t, v, deterministic)
                else:
                    t, v = layer(t, v, deterministic=deterministic)
            if output_all_layers:
                all_t.append(t)
                all_v.append(v)
        return t, v, (all_t, all_v, all_probs)

    # ------------------------------------------------------- scan fast path
    def _scannable(self) -> bool:
        """Homogeneous alternating attn/ff stack with scanning enabled."""
        if not getattr(self.cfg, "use_scan", False):
            return False
        if len(self.sublayers) % 2:
            return False
        pairs = list(zip(self.sublayers[0::2], self.sublayers[1::2]))
        if not all(isinstance(a, GatedAttentionSublayer) and
                   isinstance(f, GatedFeedForwardSublayer)
                   for a, f in pairs):
            return False
        specs = [a.spec for a, _ in pairs]
        return all(s.num_heads == specs[0].num_heads and
                   s.attn_hidden_size == specs[0].attn_hidden_size
                   for s in specs)

    def _scan_fused(self, x, bias, deterministic):
        """lax.scan over stacked per-layer params: one compiled block for
        the whole depth instead of D inlined sublayers."""
        import jax

        attn_layers = self.sublayers[0::2]
        ff_layers = self.sublayers[1::2]
        n = len(attn_layers)
        spec = attn_layers[0].spec
        head_dim = spec.attn_hidden_size // spec.num_heads

        stack = lambda trees: jax.tree.map(
            lambda *xs: jnp.stack(xs), *trees)
        attn_stack = stack([l.variables["params"] for l in attn_layers])
        ff_stack = stack([l.variables["params"] for l in ff_layers])

        if deterministic:
            seeds = jnp.zeros((n,), jnp.int32)
            hkeys = jax.random.split(jax.random.PRNGKey(0), (n, 3))
        else:
            rng = self.make_rng("dropout")
            seeds = jax.random.randint(rng, (n,), 0,
                                       jnp.iinfo(jnp.int32).max)
            hkeys = jax.random.split(jax.random.fold_in(rng, 1), (n, 3))

        cfg = self.cfg

        def body(carry, per_layer):
            ap, fp, seed, hk = per_layer
            y = _fused_attn_block(ap, carry, bias, seed, (hk[0], hk[1]),
                                  cfg=cfg, num_heads=spec.num_heads,
                                  head_dim=head_dim,
                                  deterministic=deterministic)
            y = _fused_ff_block(fp, y, hk[2], cfg=cfg,
                                deterministic=deterministic)
            return y, None

        x, _ = jax.lax.scan(body, x, (attn_stack, ff_stack, seeds, hkeys))
        return x
