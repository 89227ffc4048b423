"""Backbone and task wrappers.

reference: volta/encoders.py:918-1206 (BertModel, BertForVLPreTraining,
BertForVLTasks). Differences are functional-style only: losses live in
volta_tpu.losses and are computed from the returned logits; MLM weight tying
is explicit (the word-embedding table is threaded from the embeddings to the
MLM head).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..config import VoltaConfig
from ..ops.attention import additive_mask
from .embeddings import DUAL_EMBEDDINGS, SHARED_EMBEDDINGS, TextEmbeddings
from .encoder import GatedEncoder
from .heads import (ImagePooler, PreTrainingHeads, SimpleClassifier,
                    TextPooler, VLBertTextPooler, fuse_pooled)
from .layers import dense, gelu


def _dtype(cfg):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class VoltaModel(nn.Module):
    """Gated bimodal backbone (reference: volta/encoders.py:918-1017).

    Returns (seq_t, seq_v, pooled_t, pooled_v, extras) where extras carries
    the word-embedding table (for MLM tying), per-layer streams and attention
    probabilities when requested.
    """

    cfg: VoltaConfig

    def setup(self):
        cfg = self.cfg
        self.is_shared = cfg.image_embeddings in SHARED_EMBEDDINGS
        if self.is_shared:
            self.embeddings = SHARED_EMBEDDINGS[cfg.image_embeddings](
                cfg, name="embeddings")
        else:
            self.embeddings = TextEmbeddings(cfg, name="embeddings")
            self.v_embeddings = DUAL_EMBEDDINGS[cfg.image_embeddings](
                cfg, name="v_embeddings")
        self.encoder = GatedEncoder(cfg, name="encoder")
        if cfg.fusion_method == "vl-bert_vqa":
            self.t_pooler = VLBertTextPooler(cfg, name="t_pooler")
        elif cfg.fusion_method != "none":
            self.t_pooler = TextPooler(cfg, name="t_pooler")
        if cfg.fusion_method not in ("none", "text", "vl-bert_vqa"):
            if cfg.pooler_size != cfg.v_pooler_size:
                raise ValueError("pooler_size != v_pooler_size")
            self.v_pooler = ImagePooler(cfg, name="v_pooler")

    def __call__(self, input_ids, image_feat, image_loc,
                 token_type_ids=None, attention_mask=None,
                 image_attention_mask=None, *, deterministic: bool = True,
                 output_all_layers: bool = False, output_probs: bool = False):
        cfg = self.cfg
        # config.visualization implies attention-map capture, like the
        # reference's `self.visualization` gate (volta/encoders.py:190)
        output_probs = output_probs or cfg.visualization
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if image_attention_mask is None:
            image_attention_mask = jnp.ones(image_feat.shape[:2],
                                            dtype=input_ids.dtype)

        if self.is_shared:
            t_emb, v_emb, word_table = self.embeddings(
                input_ids, image_feat, image_loc, token_type_ids,
                deterministic=deterministic)
        else:
            t_emb, word_table = self.embeddings(
                input_ids, token_type_ids, deterministic=deterministic)
            v_emb = self.v_embeddings(image_feat, image_loc,
                                      deterministic=deterministic)

        t_bias = additive_mask(attention_mask)
        v_bias = additive_mask(image_attention_mask)

        seq_t, seq_v, (all_t, all_v, all_probs) = self.encoder(
            t_emb, v_emb, t_bias, v_bias, deterministic=deterministic,
            output_all_layers=output_all_layers, output_probs=output_probs)

        if cfg.fusion_method == "vl-bert_vqa":
            text_end = jnp.sum((input_ids != 0).astype(jnp.int32), axis=1,
                               keepdims=True)
            pooled_t = self.t_pooler(seq_t, text_end)
        elif cfg.fusion_method == "none":
            pooled_t = None
        else:
            pooled_t = self.t_pooler(seq_t)
        if cfg.fusion_method in ("none", "text", "vl-bert_vqa"):
            pooled_v = None
        else:
            pooled_v = self.v_pooler(seq_v)

        extras = {"word_table": word_table, "all_t": all_t, "all_v": all_v,
                  "probs": all_probs}
        return seq_t, seq_v, pooled_t, pooled_v, extras


class VoltaForVLPreTraining(nn.Module):
    """Pretraining wrapper producing MLM / masked-region / ITM logits
    (reference: volta/encoders.py:1020-1114). Losses in volta_tpu.losses."""

    cfg: VoltaConfig

    def setup(self):
        self.bert = VoltaModel(self.cfg, name="bert")
        self.cls = PreTrainingHeads(self.cfg, name="cls")

    def __call__(self, input_ids, image_feat, image_loc, token_type_ids=None,
                 attention_mask=None, image_attention_mask=None, *,
                 deterministic: bool = True, output_probs: bool = False):
        seq_t, seq_v, pooled_t, pooled_v, extras = self.bert(
            input_ids, image_feat, image_loc, token_type_ids, attention_mask,
            image_attention_mask, deterministic=deterministic,
            output_probs=output_probs)
        t_scores, v_scores, itm_score, pooled = self.cls(
            seq_t, seq_v, pooled_t, pooled_v, extras["word_table"],
            deterministic=deterministic)
        return {
            "mlm_logits": t_scores,
            "mrm_logits": v_scores,
            "itm_logits": itm_score,
            "pooled": pooled,
            "extras": extras,
        }


class VLogitMLP(nn.Module):
    """2-layer V-logit head (reference: volta/encoders.py:1141-1147)."""

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        dt = _dtype(cfg)
        x = dense(cfg.v_hidden_size, cfg.initializer_range, dt, "dense1")(x)
        x = gelu(x)
        x = nn.Dropout(cfg.v_attention_probs_dropout_prob)(
            x, deterministic=deterministic)
        return dense(1, cfg.initializer_range, dt, "dense2")(x)


class VoltaForVLTasks(nn.Module):
    """Fine-tuning wrapper with one classifier per task
    (reference: volta/encoders.py:1117-1206).

    ``task_cfg`` maps task ids to dicts with at least ``type`` (and
    ``num_labels`` / ``num_clf_layers`` where applicable); ``task_ids`` is a
    static tuple of tasks to build heads for.
    """

    cfg: VoltaConfig
    task_cfg: Any
    task_ids: tuple
    dropout_prob: float = 0.1

    def setup(self):
        cfg = self.cfg
        self.bert = VoltaModel(cfg, name="bert")
        clfs = {}
        for task_id in self.task_ids:
            tc = self.task_cfg[task_id]
            ttype = tc["type"]
            if ttype in ("VL-classifier", "VL-classifier-GQA"):
                clfs[task_id] = SimpleClassifier(
                    cfg, cfg.clf_hidden_size, tc["num_labels"],
                    name=f"clf_{task_id}")
            elif ttype == "VL-binary-classifier":
                clfs[task_id] = SimpleClassifier(
                    cfg, cfg.clf_hidden_size, 2, name=f"clf_{task_id}")
            elif ttype == "VL-tri-classifier":
                clfs[task_id] = dense(3, cfg.initializer_range, _dtype(cfg),
                                      f"clf_{task_id}")
            elif ttype == "VL-logit":
                clfs[task_id] = dense(1, cfg.initializer_range, _dtype(cfg),
                                      f"clf_{task_id}")
            elif ttype.startswith("V-logit"):
                if tc.get("num_clf_layers", 1) == 2:
                    clfs[task_id] = VLogitMLP(cfg, name=f"clf_{task_id}")
                else:
                    clfs[task_id] = dense(
                        1, cfg.initializer_range, _dtype(cfg), f"clf_{task_id}")
            else:
                raise ValueError(f"Undefined task type: {ttype}")
        self.clfs = clfs
        self.drop = nn.Dropout(self.dropout_prob)

    def __call__(self, input_ids, image_feat, image_loc, task_id: str,
                 token_type_ids=None, attention_mask=None,
                 image_attention_mask=None, *, deterministic: bool = True,
                 output_probs: bool = False):
        cfg = self.cfg
        seq_t, seq_v, pooled_t, pooled_v, extras = self.bert(
            input_ids, image_feat, image_loc, token_type_ids, attention_mask,
            image_attention_mask, deterministic=deterministic,
            output_probs=output_probs)

        pooled = fuse_pooled(cfg, pooled_t, pooled_v)
        if pooled is not None:
            pooled = self.drop(pooled, deterministic=deterministic)

        ttype = self.task_cfg[task_id]["type"]
        if ttype.startswith("V-logit"):
            if image_attention_mask is None:
                image_attention_mask = jnp.ones(image_feat.shape[:2],
                                                jnp.float32)
            logit = self.clfs[task_id](
                self.drop(seq_v, deterministic=deterministic))
            mask_pen = ((1.0 - image_attention_mask.astype(logit.dtype))
                        * -10000.0)[..., None]
            prediction = logit + mask_pen
        elif ttype == "VL-binary-classifier":
            # NLVR2: the two images of a pair are consecutive rows; fuse
            # their pooled outputs (reference: volta/encoders.py:1200-1202)
            prediction = self.clfs[task_id](
                pooled.reshape(-1, pooled.shape[-1] * 2))
        else:
            prediction = self.clfs[task_id](pooled)

        if self.is_initializing():
            # materialise every task head, not just the one used this call
            b = input_ids.shape[0]
            for tid in self.task_ids:
                if tid == task_id:
                    continue
                tt = self.task_cfg[tid]["type"]
                if tt.startswith("V-logit"):
                    self.clfs[tid](jnp.zeros((b, 1, cfg.v_hidden_size)))
                elif tt == "VL-binary-classifier":
                    self.clfs[tid](jnp.zeros((1, cfg.pooler_size * 2)))
                else:
                    self.clfs[tid](jnp.zeros((b, cfg.pooler_size)))
        return prediction, extras
