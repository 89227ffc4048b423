"""Model zoo: programmatic constructors for the supported architectures.

Instead of hand-maintained JSON blobs, each model family is described by its
generating pattern (how attention/FF sublayers interleave and gate). The
``emit`` entry point writes JSON files compatible with the reference schema
(reference: config/*.json, MODELS.md:23-44) so the CLIs can keep taking
``--config_file configs/<name>.json``.

Patterns:
  * single-stream (UNITER / VisualBERT / VL-BERT): D BERT layers become
    2D sublayers, attention at even indices, FF at odd; all four attention
    gates on; everything shared with a single LayerNorm over [text ‖ vision].
  * ViLBERT: text-only prefix, then alternating co-attention (tv+vt) blocks
    and per-modality (tt / vv) blocks in a dual-stream trunk.
  * LXMERT: text and vision encoders, then cross-modality blocks of
    (shared cross-attn, per-modality self-attn, per-modality FF).
"""

from __future__ import annotations

import json
import os
from typing import Dict

from .config import VoltaConfig


def _remap(attn_sublayers, ff_sublayers) -> Dict[str, Dict[str, int]]:
    """BERT layer -> sublayer maps used by the HF checkpoint importer
    (reference: volta/utils.py:475-498)."""
    return (
        {str(i): n for i, n in enumerate(attn_sublayers)},
        {str(i): n for i, n in enumerate(ff_sublayers)},
    )


def single_stream(image_embeddings: str, depth: int = 12, **overrides) -> VoltaConfig:
    """UNITER / VisualBERT / VL-BERT style: one shared encoder over both
    modalities; concat-LN couples the streams every sublayer."""
    attn = [2 * i for i in range(depth)]
    ff = [2 * i + 1 for i in range(depth)]
    a_map, f_map = _remap(attn, ff)
    cfg = dict(
        image_embeddings=image_embeddings,
        pooler_size=1024,
        v_pooler_size=1024,
        add_global_imgfeat="first",
        v_initializer_range=0.02,
        tt_attn_sublayers=attn,
        tv_attn_sublayers=attn,
        vt_attn_sublayers=attn,
        vv_attn_sublayers=attn,
        t_ff_sublayers=ff,
        v_ff_sublayers=ff,
        shared_sublayers=sorted(attn + ff),
        single_ln_sublayers=sorted(attn + ff),
        bert_layer2attn_sublayer=a_map,
        bert_layer2ff_sublayer=f_map,
    )
    cfg.update(overrides)
    return VoltaConfig(**cfg)


def vilbert(depth_text: int = 12, cross_start: int = 6, **overrides) -> VoltaConfig:
    """ViLBERT: text-only BERT prefix, then a dual-stream trunk where each
    BERT layer expands to [co-attn (tv+vt), ff, intra-attn (tt+vv), ff]."""
    tt, tv, vt, vv, t_ff, v_ff = [], [], [], [], [], []
    attn_map, ff_map = {}, {}
    n = 0
    for l in range(depth_text):
        if l < cross_start:
            tt.append(n); attn_map[str(l)] = n; n += 1
            t_ff.append(n); ff_map[str(l)] = n; n += 1
        else:
            tv.append(n); vt.append(n); n += 1
            t_ff.append(n); v_ff.append(n); n += 1
            tt.append(n); vv.append(n); attn_map[str(l)] = n; n += 1
            t_ff.append(n); v_ff.append(n); ff_map[str(l)] = n; n += 1
    cfg = dict(
        image_embeddings="vilbert",
        pooler_size=1024,
        v_pooler_size=1024,
        add_global_imgfeat="first",
        v_initializer_range=0.02,
        tt_attn_sublayers=tt,
        tv_attn_sublayers=tv,
        vt_attn_sublayers=vt,
        vv_attn_sublayers=vv,
        t_ff_sublayers=t_ff,
        v_ff_sublayers=v_ff,
        shared_sublayers=[],
        single_ln_sublayers=[],
        bert_layer2attn_sublayer=attn_map,
        bert_layer2ff_sublayer=ff_map,
    )
    cfg.update(overrides)
    return VoltaConfig(**cfg)


def lxmert(n_text: int = 9, n_vision: int = 5, n_cross: int = 5, **overrides) -> VoltaConfig:
    """LXMERT: text encoder (n_text tt+ff), vision encoder overlapping the
    first n_vision of those indices (vv+ff), then n_cross cross blocks of
    [shared cross-attn, tt & vv self-attn, t-ff & v-ff]."""
    tt, tv, vt, vv, t_ff, v_ff, shared = [], [], [], [], [], [], []
    attn_map, ff_map = {}, {}
    n = 0
    for l in range(n_text):
        tt.append(n)
        if l < n_vision:
            vv.append(n)
        attn_map[str(l)] = n
        n += 1
        t_ff.append(n)
        if l < n_vision:
            v_ff.append(n)
        ff_map[str(l)] = n
        n += 1
    for c in range(n_cross):
        tv.append(n); vt.append(n); shared.append(n); n += 1
        tt.append(n); vv.append(n)
        if n_text + c < 12:
            attn_map[str(n_text + c)] = n
        n += 1
        t_ff.append(n); v_ff.append(n)
        if n_text + c < 12:
            ff_map[str(n_text + c)] = n
        n += 1
    cfg = dict(
        image_embeddings="lxmert",
        pooler_size=1024,
        v_pooler_size=1024,
        add_global_imgfeat="first",
        v_initializer_range=0.02,
        tt_attn_sublayers=tt,
        tv_attn_sublayers=tv,
        vt_attn_sublayers=vt,
        vv_attn_sublayers=vv,
        t_ff_sublayers=t_ff,
        v_ff_sublayers=v_ff,
        shared_sublayers=shared,
        single_ln_sublayers=[],
        bert_layer2attn_sublayer=attn_map,
        bert_layer2ff_sublayer=ff_map,
    )
    cfg.update(overrides)
    return VoltaConfig(**cfg)


def build(name: str, **overrides) -> VoltaConfig:
    """Construct one of the named zoo models. ``overrides`` set config
    fields on top of the named recipe — e.g. ``model="roberta"`` for the
    RoBERTa text encoder (the reference's --bert_model switch, reference:
    train_task.py:179-180), or reduced dims for tests."""
    def _merge(base, o):
        return {**base, **o}

    zoo = {
        # --- CTRL variants (controlled setup of the VOLTA paper) ---
        "ctrl_uniter_base": lambda **o: single_stream("uniter", **o),
        "ctrl_visualbert_base":
            lambda **o: single_stream("visualbert", **o),
        "ctrl_vl-bert_base": lambda **o: single_stream(
            "vl-bert", **_merge(dict(
                type_vocab_size=3, v_coordinate_embeddings_dim=256,
                image_head_ln=False), o)),
        "ctrl_vilbert_base": lambda **o: vilbert(**o),
        "ctrl_lxmert": lambda **o: lxmert(**o),
        # --- original recipes ---
        "vilbert_base": lambda **o: vilbert(**_merge(dict(
            v_hidden_size=1024, v_num_attention_heads=8,
            v_intermediate_size=1024,
            sublayer2attn_hidden_size={str(n): 1024
                                       for n in (12, 16, 20, 24, 28, 32)},
            sublayer2num_attention_heads={str(n): 8
                                          for n in (12, 16, 20, 24, 28, 32)},
        ), o)),
        "lxmert": lambda **o: lxmert(**_merge(dict(
            pooler_size=768, num_locs=4, add_global_imgfeat=None,
            visual_target_weights={"3": 6.667, "4": 6.667, "5": 6.667},
            fusion_method="text",
        ), o)),
        "vl-bert_base": lambda **o: single_stream(
            "vl-bert", **_merge(dict(
                type_vocab_size=3, v_coordinate_embeddings_dim=256,
                image_head_ln=False, num_locs=4, add_global_imgfeat="last",
                visual_target_weights={"6": 1.0}, fusion_method="none",
                clf_hidden_size=768, pooler_size=768,
            ), o)),
    }
    if name not in zoo:
        raise KeyError(f"Unknown zoo model {name!r}; have {sorted(zoo)}")
    return zoo[name](**overrides)


ZOO_NAMES = [
    "ctrl_uniter_base", "ctrl_visualbert_base", "ctrl_vl-bert_base",
    "ctrl_vilbert_base", "ctrl_lxmert", "vilbert_base", "lxmert", "vl-bert_base",
]

# Keys emitted to JSON (reference schema only — TPU extensions stay internal).
_EMIT_KEYS = [
    "attention_probs_dropout_prob", "hidden_act", "hidden_dropout_prob",
    "hidden_size", "initializer_range", "intermediate_size",
    "max_position_embeddings", "num_attention_heads", "pooler_size",
    "type_vocab_size", "vocab_size", "num_locs", "add_global_imgfeat",
    "v_coordinate_embeddings_dim", "image_embeddings",
    "v_attention_probs_dropout_prob", "v_hidden_act", "v_hidden_dropout_prob",
    "v_feature_size", "visual_target_weights", "v_hidden_size",
    "v_initializer_range", "v_pooler_size", "v_num_attention_heads",
    "v_intermediate_size", "fusion_method", "image_head_ln", "clf_hidden_size",
    "tt_attn_sublayers", "tv_attn_sublayers", "vt_attn_sublayers",
    "vv_attn_sublayers", "t_ff_sublayers", "v_ff_sublayers",
    "shared_sublayers", "single_ln_sublayers",
    "sublayer2attn_hidden_size", "sublayer2num_attention_heads",
    "sublayer2intermediate_size", "sublayer2v_attn_hidden_size",
    "sublayer2v_num_attention_heads", "sublayer2v_intermediate_size",
    "bert_layer2attn_sublayer", "bert_layer2ff_sublayer",
]


def emit(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    for name in ZOO_NAMES:
        cfg = build(name)
        d = cfg.to_dict()
        obj = {k: d[k] for k in _EMIT_KEYS if d.get(k) is not None or k in (
            "add_global_imgfeat", "v_coordinate_embeddings_dim")}
        path = os.path.join(outdir, f"{name}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
            f.write("\n")


if __name__ == "__main__":
    import sys
    emit(sys.argv[1] if len(sys.argv) > 1 else "configs")
