"""Poolers, pretraining heads and task classifiers.

reference: volta/encoders.py:596-814 (poolers, heads, SimpleClassifier).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ..config import VoltaConfig
from .layers import ACT2FN, LayerNorm, dense, gelu

# masked-region prediction target dims keyed by objective id
# (reference: volta/losses.py:129-137)
PRE_VIS_TARGETS = {
    "0": 1601, "1": 2048, "2": 2048, "3": 1600, "4": 400, "5": 2048, "6": 1601,
}


def _dtype(cfg):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class TextPooler(nn.Module):
    """CLS-token pooler: dense + ReLU (reference: volta/encoders.py:596-607)."""

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, hidden):
        cfg = self.cfg
        x = dense(cfg.pooler_size, cfg.initializer_range, _dtype(cfg),
                  "dense")(hidden[:, 0])
        return nn.relu(x)


class VLBertTextPooler(nn.Module):
    """Pools the [MASK] slot at text_end - 2 for VL-BERT VQA
    (reference: volta/encoders.py:610-623)."""

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, hidden, text_end):
        cfg = self.cfg
        idx = jnp.clip(text_end[:, 0] - 2, 0, hidden.shape[1] - 1)  # [B]
        picked = jnp.take_along_axis(
            hidden, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        x = dense(cfg.pooler_size, cfg.initializer_range, _dtype(cfg),
                  "dense")(picked)
        return nn.relu(x)


class ImagePooler(nn.Module):
    """First-region pooler (reference: volta/encoders.py:626-637)."""

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, hidden):
        cfg = self.cfg
        x = dense(cfg.v_pooler_size, cfg.initializer_range, _dtype(cfg),
                  "dense")(hidden[:, 0])
        return nn.relu(x)


class LMPredictionHead(nn.Module):
    """MLM head with decoder tied to the word-embedding table
    (reference: volta/encoders.py:643-697). The embedding matrix is passed in
    at call time — functional weight tying."""

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, hidden, word_embedding_table):
        cfg = self.cfg
        x = nn.Dense(cfg.hidden_size,
                     kernel_init=nn.initializers.xavier_uniform(),
                     dtype=_dtype(cfg), name="transform_dense")(hidden)
        x = ACT2FN[cfg.hidden_act](x)
        x = LayerNorm(cfg.hidden_size, use_pallas=cfg.use_pallas_layernorm,
                      name="transform_ln")(x)
        bias = self.param("decoder_bias", nn.initializers.zeros,
                          (cfg.vocab_size,))
        logits = jnp.einsum("bld,vd->blv", x,
                            word_embedding_table.astype(x.dtype))
        return logits + bias.astype(logits.dtype)


class ImagePredictionHead(nn.Module):
    """Per-objective region prediction heads
    (reference: volta/encoders.py:660-737); LN optional via image_head_ln."""

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, hidden) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        x = nn.Dense(cfg.v_hidden_size,
                     kernel_init=nn.initializers.xavier_uniform(),
                     dtype=_dtype(cfg), name="transform_dense")(hidden)
        x = ACT2FN[cfg.hidden_act](x)
        if cfg.image_head_ln:
            x = LayerNorm(cfg.v_hidden_size, use_pallas=cfg.use_pallas_layernorm,
                          name="transform_ln")(x)
        out = {}
        for ix, dim in PRE_VIS_TARGETS.items():
            if cfg.visual_target_weights.get(ix, 0) > 0:
                out[ix] = nn.Dense(
                    dim, kernel_init=nn.initializers.xavier_uniform(),
                    dtype=_dtype(cfg), name=f"decoder_{ix}")(x)
        return out


def fuse_pooled(cfg: VoltaConfig, pooled_t, pooled_v):
    """Cross-modal fusion of pooled outputs
    (reference: volta/encoders.py:767-778)."""
    if cfg.fusion_method == "sum":
        return pooled_t + pooled_v
    if cfg.fusion_method == "mul":
        return pooled_t * pooled_v
    if cfg.fusion_method in ("text", "vl-bert_vqa"):
        return pooled_t
    if cfg.fusion_method == "none":
        return None
    raise ValueError(f"Invalid fusion method: {cfg.fusion_method}")


class PreTrainingHeads(nn.Module):
    """MLM + ITM + masked-region heads (reference: volta/encoders.py:740-784)."""

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, seq_t, seq_v, pooled_t, pooled_v, word_embedding_table,
                 *, deterministic=True):
        cfg = self.cfg
        pooled = fuse_pooled(cfg, pooled_t, pooled_v)
        if pooled is not None:
            pooled = nn.Dropout(0.1)(pooled, deterministic=deterministic)
        t_scores = LMPredictionHead(cfg, name="predictions")(
            seq_t, word_embedding_table)
        v_scores = ImagePredictionHead(cfg, name="image_predictions")(seq_v)
        if cfg.fusion_method in ("none", "vl-bert_vqa") or pooled is None:
            itm_score = None
        else:
            itm_score = nn.Dense(
                2, kernel_init=nn.initializers.xavier_uniform(),
                dtype=_dtype(cfg), name="bi_seq_relationship")(pooled)
        return t_scores, v_scores, itm_score, pooled


class SimpleClassifier(nn.Module):
    """dense -> GeLU -> LN -> dense (reference: volta/encoders.py:787-814)."""

    cfg: VoltaConfig
    hid_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        std = cfg.initializer_range
        dt = _dtype(cfg)
        x = dense(self.hid_dim, std, dt, "dense1")(x)
        x = gelu(x)
        x = LayerNorm(self.hid_dim, use_pallas=cfg.use_pallas_layernorm, name="ln")(x)
        return dense(self.out_dim, std, dt, "dense2")(x)
