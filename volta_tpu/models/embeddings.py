"""Text and vision embedding variants.

Five vision-embedding schemes select the architecture family
(reference: volta/embeddings.py):
  * dual-stream: ``vilbert`` (sum then LN), ``lxmert`` (two LNs then average)
  * single-stream ("shared"): ``vl-bert`` (sinusoidal box geometry + feature
    MLP, joint position-id scheme), ``visualbert`` (projection + copied
    text type/pos tables), ``uniter`` (feature+location linears, each LN'd)

All in-place reference idioms (masked-feature overwrite, position-id
rewrites) are re-expressed with ``jnp.where`` over statically shaped arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import VoltaConfig
from .layers import LayerNorm, dense, embed


def _dtype(cfg):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


# ===================================================================== text
class TextEmbeddings(nn.Module):
    """word + position + token_type embeddings, LN, dropout
    (reference: volta/embeddings.py:39-70)."""

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, *, deterministic=True,
                 position_ids=None):
        cfg = self.cfg
        std = cfg.initializer_range
        word = embed(cfg.vocab_size, cfg.hidden_size, std, "word_embeddings",
                     zero_pad_row=True)
        pos = embed(cfg.max_position_embeddings, cfg.hidden_size, std,
                    "position_embeddings")
        typ = embed(cfg.type_vocab_size, cfg.hidden_size, std,
                    "token_type_embeddings")
        if position_ids is None:
            seq = input_ids.shape[1]
            if cfg.model == "roberta" and cfg.roberta_position_offset:
                # fairseq-style positions beginning at padding_idx + 1 = 2 —
                # what the reference's RobertaEmbeddings COMPUTES
                # (volta/embeddings.py:82-93) but never uses: its parent
                # BertEmbeddings.forward overwrites position_ids with
                # arange(seq) unconditionally (volta/embeddings.py:55-57,
                # verified against the in-sandbox oracle), so as-shipped
                # RoBERTa positions are 0-based like BERT's. Opt-in only.
                position_ids = jnp.arange(2, seq + 2, dtype=jnp.int32)
            else:
                position_ids = jnp.arange(seq, dtype=jnp.int32)
            position_ids = jnp.broadcast_to(position_ids[None, :],
                                            input_ids.shape)
        x = word(input_ids) + pos(position_ids) + typ(token_type_ids)
        x = LayerNorm(cfg.hidden_size, use_pallas=cfg.use_pallas_layernorm,
                      name="layer_norm")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return x.astype(_dtype(cfg)), word.embedding


# ============================================================== dual-stream
class ViLBertImageEmbeddings(nn.Module):
    """feature linear + location linear, summed, one LN
    (reference: volta/embeddings.py:127-146)."""

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, feats, locs, *, deterministic=True):
        cfg = self.cfg
        std = cfg.v_initializer_range
        dt = _dtype(cfg)
        img = dense(cfg.v_hidden_size, std, dt, "feat_dense")(feats)
        loc = dense(cfg.v_hidden_size, std, dt, "loc_dense")(locs)
        x = LayerNorm(cfg.v_hidden_size, use_pallas=cfg.use_pallas_layernorm,
                      name="layer_norm")(img + loc)
        x = nn.Dropout(cfg.v_hidden_dropout_prob)(x, deterministic=deterministic)
        return x.astype(dt)


class LxmertImageEmbeddings(nn.Module):
    """separate LNs on feature and location embeddings, then averaged
    (reference: volta/embeddings.py:149-172)."""

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, feats, locs, *, deterministic=True):
        cfg = self.cfg
        std = cfg.v_initializer_range
        dt = _dtype(cfg)
        img = dense(cfg.v_hidden_size, std, dt, "feat_dense")(feats)
        loc = dense(cfg.v_hidden_size, std, dt, "loc_dense")(locs)
        img = LayerNorm(cfg.v_hidden_size, use_pallas=cfg.use_pallas_layernorm,
                        name="feat_ln")(img)
        loc = LayerNorm(cfg.v_hidden_size, use_pallas=cfg.use_pallas_layernorm,
                        name="loc_ln")(loc)
        x = (img + loc) / 2
        x = nn.Dropout(cfg.v_hidden_dropout_prob)(x, deterministic=deterministic)
        return x.astype(dt)


DUAL_EMBEDDINGS = {
    "vilbert": ViLBertImageEmbeddings,
    "lxmert": LxmertImageEmbeddings,
}


# ============================================================ single-stream
def coordinate_embeddings(boxes, dim):
    """Sinusoidal embeddings of (x_c, y_c, w, h)*100 over 1000^(i/dim)
    (reference: volta/embeddings.py:102-124). boxes [B,K,>=4] -> [B,K,4,2dim]."""
    xc = (boxes[..., 0] + boxes[..., 2]) / 2 * 100
    yc = (boxes[..., 1] + boxes[..., 3]) / 2 * 100
    w = (boxes[..., 2] - boxes[..., 0]) * 100
    h = (boxes[..., 3] - boxes[..., 1]) * 100
    pos = jnp.stack([xc, yc, w, h], axis=-1)  # [B,K,4]
    dim_mat = 1000.0 ** (jnp.arange(dim, dtype=boxes.dtype) / dim)
    ang = pos[..., None] / dim_mat  # [B,K,4,dim]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class VLBertEmbeddings(nn.Module):
    """VL-BERT joint embeddings (reference: volta/embeddings.py:184-301).

    Notable semantics preserved:
      * all-zero feature rows are masked-region rows -> replaced with the
        learned mask visual embedding;
      * text tokens receive the *last* region's visual feature;
      * joint position ids: text pads (pos >= text_end) skip over the
        K region slots; regions sit at text_end, the end token at
        text_end + 1;
      * one LayerNorm over the concatenated [text ‖ region] sequence.
    """

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, input_ids, feats, locs, token_type_ids, *,
                 deterministic=True):
        cfg = self.cfg
        std = cfg.initializer_range
        dt = _dtype(cfg)
        b, k, _ = feats.shape
        seq = input_ids.shape[1]
        with_mvrc = cfg.visual_target_weights.get("6", 0) > 0

        mask_visual = self.param("object_mask_visual_embedding",
                                 nn.initializers.zeros, (1, cfg.v_feature_size))
        mvrc_mask = jnp.all(feats == 0.0, axis=-1)  # [B,K]
        feats = jnp.where(mvrc_mask[..., None], mask_visual[0], feats)

        coord = coordinate_embeddings(
            locs[..., :4].astype(jnp.float32), cfg.v_coordinate_embeddings_dim)
        coord = coord.reshape(b, k, -1)
        # obj_downsample: dropout -> Linear(2*v_feature) -> ReLU
        # (reference: volta/embeddings.py:196-200); xavier-init'd.
        down_in = jnp.concatenate([coord, feats], axis=-1)
        down_in = nn.Dropout(cfg.v_attention_probs_dropout_prob)(
            down_in, deterministic=deterministic)
        final_feats = nn.Dense(
            cfg.v_hidden_size,
            kernel_init=nn.initializers.xavier_uniform(),
            name="obj_downsample")(down_in)
        final_feats = nn.relu(final_feats)

        # vision tokens
        obj_vis = final_feats
        if cfg.v_hidden_size != cfg.hidden_size:
            obj_vis = dense(cfg.hidden_size, std, dt, "visual_1x1_object")(obj_vis)
        obj_vis = LayerNorm(cfg.hidden_size, use_pallas=cfg.use_pallas_layernorm,
                            name="visual_ln_object")(obj_vis)
        obj_ling_table = embed(1, cfg.hidden_size, std,
                               "object_linguistic_embeddings")
        obj_ling = jnp.broadcast_to(
            obj_ling_table(jnp.zeros((b, k), jnp.int32)), (b, k, cfg.hidden_size))
        if with_mvrc:
            mask_word = self.param("object_mask_word_embedding",
                                   nn.initializers.normal(std),
                                   (1, cfg.hidden_size))
            obj_ling = jnp.where(mvrc_mask[..., None], mask_word[0], obj_ling)
        end_table = embed(1, cfg.hidden_size, std, "end_embedding")
        end_vec = end_table(jnp.zeros((b,), jnp.int32))  # [B,H]
        is_last = jnp.arange(k) == (k - 1)
        obj_ling = jnp.where(is_last[None, :, None], end_vec[:, None, :], obj_ling)
        object_vl = obj_ling + obj_vis

        # text tokens
        word = embed(cfg.vocab_size, cfg.hidden_size, std, "word_embeddings",
                     zero_pad_row=True)
        text_ling = word(input_ids)
        text_vis = jnp.broadcast_to(final_feats[:, -1][:, None, :],
                                    (b, seq, cfg.v_hidden_size))
        if cfg.v_hidden_size != cfg.hidden_size:
            text_vis = dense(cfg.hidden_size, std, dt, "visual_1x1_text")(text_vis)
        text_vis = LayerNorm(cfg.hidden_size, use_pallas=cfg.use_pallas_layernorm,
                             name="visual_ln_text")(text_vis)
        text_vl = text_ling + text_vis

        # token types: vision rows get type 2
        typ = embed(cfg.type_vocab_size, cfg.hidden_size, std,
                    "token_type_embeddings")
        text_type = typ(token_type_ids)
        obj_type = typ(jnp.full((b, k), 2, jnp.int32))

        # joint position ids (reference: volta/embeddings.py:284-292)
        pos_table = embed(cfg.max_position_embeddings, cfg.hidden_size, std,
                          "position_embeddings")
        text_end = jnp.sum((input_ids != 0).astype(jnp.int32), axis=1,
                           keepdims=True)  # [B,1]
        base = jnp.broadcast_to(jnp.arange(seq, dtype=jnp.int32)[None, :],
                                (b, seq))
        text_pos_ids = jnp.where(base >= text_end, base + k, base)
        obj_pos_ids = jnp.broadcast_to(text_end, (b, k))
        obj_pos_ids = obj_pos_ids.at[:, -1].add(1)
        text_pos = pos_table(text_pos_ids)
        obj_pos = pos_table(obj_pos_ids)

        t = text_vl + text_pos + text_type
        v = object_vl + obj_pos + obj_type
        joint = jnp.concatenate([t, v], axis=1)
        joint = LayerNorm(cfg.hidden_size, use_pallas=cfg.use_pallas_layernorm,
                          name="layer_norm")(joint)
        joint = nn.Dropout(cfg.hidden_dropout_prob)(
            joint, deterministic=deterministic)
        joint = joint.astype(dt)
        return joint[:, :seq], joint[:, seq:], word.embedding


class VisualBertEmbeddings(nn.Module):
    """VisualBERT joint embeddings (reference: volta/embeddings.py:304-398):
    projected features + copied-from-text visual type/pos tables, one LN over
    the concatenated sequence."""

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, input_ids, feats, locs, token_type_ids, *,
                 deterministic=True):
        cfg = self.cfg
        std = cfg.initializer_range
        dt = _dtype(cfg)
        b, k, _ = feats.shape
        seq = input_ids.shape[1]

        word = embed(cfg.vocab_size, cfg.hidden_size, std, "word_embeddings",
                     zero_pad_row=True)
        pos = embed(cfg.max_position_embeddings, cfg.hidden_size, std,
                    "position_embeddings")
        typ = embed(cfg.type_vocab_size, cfg.hidden_size, std,
                    "token_type_embeddings")
        position_ids = jnp.broadcast_to(
            jnp.arange(seq, dtype=jnp.int32)[None, :], input_ids.shape)
        t = word(input_ids) + pos(position_ids) + typ(token_type_ids)

        proj = dense(cfg.hidden_size, std, dt, "projection")(feats)
        v_typ = embed(cfg.type_vocab_size, cfg.hidden_size, std,
                      "token_type_embeddings_visual")
        v_pos = embed(cfg.max_position_embeddings, cfg.hidden_size, std,
                      "position_embeddings_visual")
        type_ids_v = jnp.ones((b, k), jnp.int32)
        pos_ids_v = jnp.zeros((b, k), jnp.int32)
        v = proj + v_pos(pos_ids_v) + v_typ(type_ids_v)

        joint = jnp.concatenate([t, v], axis=1)
        joint = LayerNorm(cfg.hidden_size, use_pallas=cfg.use_pallas_layernorm,
                          name="layer_norm")(joint)
        joint = nn.Dropout(cfg.hidden_dropout_prob)(
            joint, deterministic=deterministic)
        joint = joint.astype(dt)
        return joint[:, :seq], joint[:, seq:], word.embedding


class UniterEmbeddings(nn.Module):
    """UNITER joint embeddings (reference: volta/embeddings.py:401-457):
    text LN'd separately; vision = LN(featW) + LN(locW) + type(1), own LN."""

    cfg: VoltaConfig

    @nn.compact
    def __call__(self, input_ids, feats, locs, token_type_ids, *,
                 deterministic=True):
        cfg = self.cfg
        std = cfg.initializer_range
        dt = _dtype(cfg)
        b, k, _ = feats.shape
        seq = input_ids.shape[1]

        word = embed(cfg.vocab_size, cfg.hidden_size, std, "word_embeddings",
                     zero_pad_row=True)
        pos = embed(cfg.max_position_embeddings, cfg.hidden_size, std,
                    "position_embeddings")
        typ = embed(cfg.type_vocab_size, cfg.hidden_size, std,
                    "token_type_embeddings")
        position_ids = jnp.broadcast_to(
            jnp.arange(seq, dtype=jnp.int32)[None, :], input_ids.shape)
        t = word(input_ids) + pos(position_ids) + typ(token_type_ids)
        t = LayerNorm(cfg.hidden_size, use_pallas=cfg.use_pallas_layernorm,
                      name="layer_norm")(t)
        t = nn.Dropout(cfg.hidden_dropout_prob)(t, deterministic=deterministic)

        img = dense(cfg.v_hidden_size, std, dt, "feat_dense")(feats)
        img = LayerNorm(cfg.hidden_size, use_pallas=cfg.use_pallas_layernorm,
                        name="feat_ln")(img)
        loc = dense(cfg.v_hidden_size, std, dt, "loc_dense")(locs)
        loc = LayerNorm(cfg.hidden_size, use_pallas=cfg.use_pallas_layernorm,
                        name="loc_ln")(loc)
        v = img + loc + typ(jnp.ones((b, k), jnp.int32))
        v = LayerNorm(cfg.hidden_size, use_pallas=cfg.use_pallas_layernorm,
                      name="v_layer_norm")(v)
        v = nn.Dropout(cfg.hidden_dropout_prob)(v, deterministic=deterministic)
        return t.astype(dt), v.astype(dt), word.embedding


SHARED_EMBEDDINGS = {
    "vl-bert": VLBertEmbeddings,
    "visualbert": VisualBertEmbeddings,
    "uniter": UniterEmbeddings,
}
