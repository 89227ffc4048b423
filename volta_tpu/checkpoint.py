"""Checkpoint I/O: torch-format importers and Orbax train-state persistence.

Importers (reference: volta/utils.py:250-560):
  * VOLTA-format torch ``.bin`` state dicts (the published checkpoints),
  * HF BERT checkpoints with the BERT-layer -> VOLTA-sublayer remapping
    driven by ``bert_layer2attn_sublayer`` / ``bert_layer2ff_sublayer``
    (reference: volta/utils.py:475-498),
  * gamma/beta -> weight/bias renames (reference: volta/utils.py:461-473),
  * token-type embedding resize (reference: train_concap.py:188-195).

Orbax side: async-capable save/restore of the full train state
(params/optimizer/step/metrics), replacing the reference's
``pytorch_ckpt_latest.tar`` bundle (reference: volta/train_utils.py:295-340)
with preemption-tolerant auto-resume.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import VoltaConfig

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------- torch I/O
def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.bin``/``.tar`` checkpoint into numpy arrays."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return _normalize_keys(obj)


# ------------------------------------------------------- name derivation
_EMB_MAP_COMMON = {
    "word_embeddings": ("word_embeddings", "embed"),
    "position_embeddings": ("position_embeddings", "embed"),
    "token_type_embeddings": ("token_type_embeddings", "embed"),
    "layer_norm": ("LayerNorm", "ln"),
}

_EMB_MAP_BY_VARIANT = {
    "uniter": {
        "feat_dense": ("image_embeddings", "dense"),
        "loc_dense": ("image_location_embeddings", "dense"),
        "feat_ln": ("image_layer_norm", "ln"),
        "loc_ln": ("image_location_layer_norm", "ln"),
        "v_layer_norm": ("v_LayerNorm", "ln"),
    },
    "visualbert": {
        "projection": ("projection", "dense"),
        "token_type_embeddings_visual": ("token_type_embeddings_visual", "embed"),
        "position_embeddings_visual": ("position_embeddings_visual", "embed"),
    },
    "vl-bert": {
        "obj_downsample": ("obj_downsample.1", "dense"),
        "object_linguistic_embeddings": ("object_linguistic_embeddings", "embed"),
        "object_mask_word_embedding": ("object_mask_word_embedding", "param2d"),
        "object_mask_visual_embedding": ("object_mask_visual_embedding", "param2d"),
        "end_embedding": ("end_embedding", "embed"),
        "visual_1x1_text": ("visual_1x1_text", "dense"),
        "visual_1x1_object": ("visual_1x1_object", "dense"),
        "visual_ln_text": ("visual_ln_text", "ln"),
        "visual_ln_object": ("visual_ln_object", "ln"),
    },
    # dual-stream v_embeddings
    "vilbert_v": {
        "feat_dense": ("image_embeddings", "dense"),
        "loc_dense": ("image_location_embeddings", "dense"),
        "layer_norm": ("LayerNorm", "ln"),
    },
    "lxmert_v": {
        "feat_dense": ("image_embeddings", "dense"),
        "loc_dense": ("image_location_embeddings", "dense"),
        "feat_ln": ("ImgLayerNorm", "ln"),
        "loc_ln": ("LocLayerNorm", "ln"),
    },
}

_ATTN_MAP = {
    "query": ("attention_self.query", "dense"),
    "key": ("attention_self.key", "dense"),
    "value": ("attention_self.value", "dense"),
    "v_query": ("attention_self.v_query", "dense"),
    "v_key": ("attention_self.v_key", "dense"),
    "v_value": ("attention_self.v_value", "dense"),
    "out_dense": ("attention_output.dense", "dense"),
    "out_ln": ("attention_output.LayerNorm", "ln"),
    "v_out_dense": ("attention_output.v_dense", "dense"),
    "v_out_ln": ("attention_output.v_LayerNorm", "ln"),
}

_FF_MAP = {
    "inter_dense": ("intermediate.dense", "dense"),
    "v_inter_dense": ("intermediate.v_dense", "dense"),
    "out_dense": ("output.dense", "dense"),
    "out_ln": ("output.LayerNorm", "ln"),
    "v_out_dense": ("output.v_dense", "dense"),
    "v_out_ln": ("output.v_LayerNorm", "ln"),
}

# HF BERT uses these inside encoder.layer.{i}.
_HF_ATTN_MAP = {
    "query": ("attention.self.query", "dense"),
    "key": ("attention.self.key", "dense"),
    "value": ("attention.self.value", "dense"),
    "out_dense": ("attention.output.dense", "dense"),
    "out_ln": ("attention.output.LayerNorm", "ln"),
}

_HF_FF_MAP = {
    "inter_dense": ("intermediate.dense", "dense"),
    "out_dense": ("output.dense", "dense"),
    "out_ln": ("output.LayerNorm", "ln"),
}

_CLS_MAP = {
    ("predictions", "transform_dense"): ("cls.predictions.transform.dense", "dense"),
    ("predictions", "transform_ln"): ("cls.predictions.transform.LayerNorm", "ln"),
    ("predictions", "decoder_bias"): ("cls.predictions.bias", "raw"),
    ("image_predictions", "transform_dense"):
        ("cls.imagePredictions.transform.dense", "dense"),
    ("image_predictions", "transform_ln"):
        ("cls.imagePredictions.transform.LayerNorm", "ln"),
    ("bi_seq_relationship",): ("cls.bi_seq_relationship", "dense"),
}


def _ref_key(path: Tuple[str, ...], cfg: VoltaConfig, from_hf: bool
             ) -> Optional[Tuple[str, str]]:
    """Map one of our param-tree paths to (reference key prefix, kind)."""
    if path[0] == "bert":
        path = path[1:]
        prefix = "bert."
    else:
        prefix = ""
    # resolve "bert." lazily: reference checkpoints for the wrappers carry it,
    # plain BertModel ones do not — the caller tries both.

    if path[0] == "embeddings":
        sub = path[1]
        m = dict(_EMB_MAP_COMMON)
        m.update(_EMB_MAP_BY_VARIANT.get(cfg.image_embeddings, {}))
        if sub in m:
            name, kind = m[sub]
            return prefix + "embeddings." + name, kind
        return None
    if path[0] == "v_embeddings":
        sub = path[1]
        m = _EMB_MAP_BY_VARIANT.get(cfg.image_embeddings + "_v", {})
        if sub in m:
            name, kind = m[sub]
            return prefix + "v_embeddings." + name, kind
        return None
    if path[0] == "encoder":
        layer = path[1]  # attn_{n} | ff_{n}
        sub = path[2]
        kind_map = _ATTN_MAP if layer.startswith("attn_") else _FF_MAP
        n = int(layer.split("_")[1])
        if from_hf:
            inv = {int(v): int(k) for k, v in
                   (cfg.bert_layer2attn_sublayer if layer.startswith("attn_")
                    else cfg.bert_layer2ff_sublayer).items()}
            if n not in inv:
                return None
            i = inv[n]
            hf_map = _HF_ATTN_MAP if layer.startswith("attn_") else _HF_FF_MAP
            if sub not in hf_map:
                return None  # vision params never come from HF BERT
            name, kind = hf_map[sub]
            return prefix + f"encoder.layer.{i}." + name, kind
        if sub not in kind_map:
            return None
        name, kind = kind_map[sub]
        return prefix + f"encoder.layer.{n}." + name, kind
    if path[0] == "t_pooler":
        if from_hf:
            return None  # sizes differ; keep init
        return prefix + "t_pooler.dense", "dense"
    if path[0] == "v_pooler":
        if from_hf:
            return None
        return prefix + "v_pooler.dense", "dense"
    if path[0] == "cls":
        if path[1] == "image_predictions" and path[2].startswith("decoder_"):
            ix = path[2].split("_")[1]
            return f"cls.imagePredictions.decoder_dict.{ix}", "dense"
        for k, v in _CLS_MAP.items():
            if tuple(path[1:1 + len(k)]) == k:
                return v
        return None
    if path[0].startswith("clf_"):
        task = path[0][len("clf_"):]
        base = f"clfs_dict.{task}"
        if len(path) == 2:  # bare Dense clf: ("clf_X", "kernel"|"bias")
            return base, "dense"
        # SimpleClassifier names its Sequential "logit_fc" (reference:
        # volta/encoders.py:787-814); the 2-layer V-logit head is an
        # anonymous Sequential ("clfs_dict.X.0" / ".3", reference:
        # volta/encoders.py:1141-1147). import_state_dict also tries the
        # key with ".logit_fc" stripped, covering the latter.
        m = {"dense1": (".logit_fc.0", "dense"), "ln": (".logit_fc.2", "ln"),
             "dense2": (".logit_fc.3", "dense")}
        sub = path[1]
        if sub in m:
            name, kind = m[sub]
            return base + name, kind
        return None
    return None


def _fetch(sd: Dict[str, np.ndarray], key: str, leaf: str, kind: str,
           used: set) -> Optional[np.ndarray]:
    """Pull one leaf (kernel/bias/scale/embedding) from the state dict."""
    def take(full, transpose=False):
        v = sd.get(full)
        if v is not None:
            used.add(full)
            return v.T if transpose else v
        return None

    if kind == "dense":
        if leaf == "kernel":
            return take(key + ".weight", transpose=True)
        return take(key + ".bias")
    if kind == "ln":
        return take(key + (".weight" if leaf == "scale" else ".bias"))
    if kind in ("embed", "param2d"):
        return take(key + ".weight")
    if kind == "raw":
        return take(key)
    return None


def import_state_dict(cfg: VoltaConfig, params: Any,
                      sd: Dict[str, np.ndarray], *, from_hf: bool = False,
                      strict: bool = False) -> Tuple[Any, Dict[str, Any]]:
    """Overlay a torch state dict onto an initialised Flax param pytree.

    Returns (new_params, report) where report lists loaded / skipped paths
    and state-dict keys that went unused.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    has_bert_keys = any(k.startswith("bert.") for k in sd)

    new_leaves = []
    loaded, skipped, used = [], [], set()
    for path, leaf in flat:
        names = tuple(p.key for p in path)
        if names and names[0] == "params":
            names = names[1:]
        ref = _ref_key(names, cfg, from_hf)
        val = None
        if ref is not None:
            key, kind = ref
            candidates = [key]
            if ".logit_fc." in key:
                # 2-layer V-logit heads use an unnamed Sequential
                candidates.append(key.replace(".logit_fc.", "."))
            if key.startswith("bert.") and not has_bert_keys:
                candidates.append(key[len("bert."):])
            elif not key.startswith("bert.") and has_bert_keys:
                candidates.insert(0, "bert." + key)
            for cand in candidates:
                val = _fetch(sd, cand, names[-1], kind, used)
                if val is not None:
                    break
        if val is None:
            skipped.append(".".join(names))
            new_leaves.append(leaf)
            continue
        val = np.asarray(val, dtype=np.asarray(leaf).dtype)
        if val.shape != leaf.shape:
            # token-type resize: copy the leading rows
            # (reference: train_concap.py:188-195)
            if ("token_type_embeddings" in names and
                    val.shape[0] < leaf.shape[0] and
                    val.shape[1:] == leaf.shape[1:]):
                grown = np.array(leaf)
                grown[: val.shape[0]] = val
                val = grown
            elif strict:
                raise ValueError(
                    f"shape mismatch for {'.'.join(names)}: "
                    f"{val.shape} vs {leaf.shape}")
            else:
                skipped.append(".".join(names) + " (shape)")
                new_leaves.append(leaf)
                continue
        loaded.append(".".join(names))
        new_leaves.append(val)

    report = {
        "loaded": loaded,
        "skipped": skipped,
        "unused": sorted(set(sd) - used),
    }
    if strict and report["skipped"]:
        raise ValueError(f"missing keys: {report['skipped']}")
    new_params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return new_params, report


# ------------------------------------------- reverse export (jax -> torch)
# share_layer makes the reference register one torch module under two names
# (reference: volta/encoders.py:208-217 attention, :473-478/:527-532 FF), so
# its state dict carries v_* alias keys; a strict load_state_dict of an
# exported dict needs them emitted explicitly.
_ATTN_ALIASES = (
    ("attention_self.query", "attention_self.v_query"),
    ("attention_self.key", "attention_self.v_key"),
    ("attention_self.value", "attention_self.v_value"),
    ("attention_output.dense", "attention_output.v_dense"),
    ("attention_output.LayerNorm", "attention_output.v_LayerNorm"),
)
_FF_ALIASES = (
    ("intermediate.dense", "intermediate.v_dense"),
    ("output.dense", "output.v_dense"),
    ("output.LayerNorm", "output.v_LayerNorm"),
)


def export_torch_state_dict(cfg: VoltaConfig, params: Any
                            ) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Inverse of :func:`import_state_dict`: emit a reference-format torch
    state dict from a Flax param pytree, loadable by the reference models
    (``volta/encoders.py`` BertModel / BertForVLPreTraining / BertForVLTasks)
    via ``load_state_dict(strict=True)``.

    Handles the same name mapping in reverse (dense kernels transposed back,
    LN scale -> ``.weight``), plus the parts the forward importer reads
    implicitly: the tied MLM decoder weight (``cls.predictions.decoder.weight``
    = the word-embedding table, reference: volta/encoders.py:686-692) and the
    ``v_*`` alias keys of shared sublayers. 2-layer V-logit heads (which the
    reference builds as an anonymous ``nn.Sequential``, encoders.py:1141-1147)
    are detected by their missing LN leaf and exported under ``clfs_dict.X.{0,3}``
    instead of ``.logit_fc.{0,2,3}``.

    Returns ``(state_dict, report)``; ``report["unexported"]`` lists any of our
    param paths with no reference mapping (expected empty).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    # which clf heads are SimpleClassifier (has "ln") vs anonymous Sequential
    clf_leaves: Dict[str, set] = {}
    paths = []
    for path, leaf in flat:
        names = tuple(p.key for p in path)
        if names and names[0] == "params":
            names = names[1:]
        paths.append((names, leaf))
        if names[0].startswith("clf_") and len(names) == 3:
            clf_leaves.setdefault(names[0], set()).add(names[1])

    sd: Dict[str, np.ndarray] = {}
    unexported = []
    word_table_key = None
    for names, leaf in paths:
        ref = _ref_key(names, cfg, from_hf=False)
        if ref is None:
            unexported.append(".".join(names))
            continue
        key, kind = ref
        if ".logit_fc." in key and "ln" not in clf_leaves.get(names[0], ()):
            key = key.replace(".logit_fc.", ".")  # anonymous Sequential head
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(np.float32)
        leaf_name = names[-1]
        if kind == "dense":
            if leaf_name == "kernel":
                sd[key + ".weight"] = np.ascontiguousarray(arr.T)
            else:
                sd[key + ".bias"] = arr
        elif kind == "ln":
            sd[key + (".weight" if leaf_name == "scale" else ".bias")] = arr
        elif kind in ("embed", "param2d"):
            sd[key + ".weight"] = arr
            if key.endswith("embeddings.word_embeddings"):
                word_table_key = key + ".weight"
        elif kind == "raw":
            sd[key] = arr
        else:  # pragma: no cover - exhaustive kinds above
            unexported.append(".".join(names))

    # tied MLM decoder (torch registers the shared tensor under both names)
    if "cls.predictions.bias" in sd and word_table_key is not None:
        sd["cls.predictions.decoder.weight"] = sd[word_table_key]

    # shared-sublayer aliases
    prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
    for spec in cfg.sublayer_plan():
        if not spec.share_params:
            continue
        aliases = _ATTN_ALIASES if spec.kind == "attn" else _FF_ALIASES
        base = f"{prefix}encoder.layer.{spec.index}."
        for src, dst in aliases:
            for leaf in (".weight", ".bias"):
                if base + src + leaf in sd:
                    sd[base + dst + leaf] = sd[base + src + leaf]

    return sd, {"unexported": unexported}


def save_torch_checkpoint(path: str, cfg: VoltaConfig, params: Any) -> str:
    """Write ``export_torch_state_dict`` output as a torch ``.bin`` the
    reference can load (reference save format: volta/train_utils.py:295-303)."""
    import torch

    sd, report = export_torch_state_dict(cfg, params)
    if report["unexported"]:
        logger.warning("paths without a reference mapping: %s",
                       report["unexported"])
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
    return path


# ------------------------------------- mid-run resume from a reference tar
def _tolerant_torch_load(path: str):
    """``torch.load`` that survives unknown classes: the reference's
    ``pytorch_ckpt_latest.tar`` embeds its live ``tbLogger`` object
    (volta/train_utils.py:305-317), whose class only exists when the
    reference package is importable — unpickle such objects as opaque
    stubs instead of failing."""
    import pickle

    import torch

    class _Opaque:
        def __init__(self, *a, **k):
            pass

        def __setstate__(self, state):
            self.__dict__["_opaque_state"] = state

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except Exception:  # noqa: BLE001 - any unimportable class
                return _Opaque

    shim = type("pickle_shim", (), {"Unpickler": _Unpickler,
                                    "load": staticmethod(pickle.load)})
    return torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=shim)


_NO_DECAY_REF = ("bias", "LayerNorm.bias", "LayerNorm.weight")


def _alias_key_set(cfg: VoltaConfig, sd: Dict[str, Any]) -> set:
    """State-dict keys that are second names of a shared tensor — the keys
    ``named_parameters()`` (which the reference's optimizer grouping loops
    iterate) deduplicates away: the tied MLM decoder weight and the
    share_layer ``v_*`` aliases (see export_torch_state_dict)."""
    keys = set()
    if "cls.predictions.decoder.weight" in sd:
        keys.add("cls.predictions.decoder.weight")
    prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
    for spec in cfg.sublayer_plan():
        if not spec.share_params:
            continue
        aliases = _ATTN_ALIASES if spec.kind == "attn" else _FF_ALIASES
        base = f"{prefix}encoder.layer.{spec.index}."
        for _, dst in aliases:
            for leaf in (".weight", ".bias"):
                if base + dst + leaf in sd:
                    keys.add(base + dst + leaf)
    return keys


def _normalize_keys(raw: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """DDP-prefix strip + gamma/beta renames + tensor->numpy (shared by
    load_torch_state_dict and the tar-resume path)."""
    out = {}
    for k, v in raw.items():
        k = re.sub(r"^module\.", "", k)
        k = k.replace(".gamma", ".weight").replace(".beta", ".bias")
        out[k] = np.asarray(v.detach().cpu().numpy()) \
            if hasattr(v, "detach") else np.asarray(v)
    return out


def _optimizer_index_to_name(cfg: VoltaConfig, msd: Dict[str, np.ndarray],
                             param_groups) -> Dict[int, str]:
    """Reconstruct which parameter each torch optimizer-state index refers
    to. torch assigns indices by flat enumeration over the param groups;
    the groups were built from ``named_parameters()`` — whose order equals
    the state-dict key order minus shared-tensor aliases (no buffers exist
    in the reference models) — filtered by ``requires_grad`` (freeze_layers
    substring matching on config.fixed_layers, volta/train_utils.py:250-255)
    and partitioned by the grouping scheme:
      * one param per group (train_task.py:208-218, the pretrained branch
        of train_concap.py:212-224): named order as-is;
      * two groups (train_concap.py:204-210): all decay params first, then
        all no-decay, each in named order."""
    named = [k for k in msd if k not in _alias_key_set(cfg, msd)]
    fixed = tuple(getattr(cfg, "fixed_layers", None) or ())
    if fixed:
        named = [k for k in named if not any(f in k for f in fixed)]
    if param_groups and all(len(g["params"]) == 1 for g in param_groups):
        order = named
    elif len(param_groups) == 2:
        nd = lambda k: any(s in k for s in _NO_DECAY_REF)  # noqa: E731
        order = [k for k in named if not nd(k)] + \
                [k for k in named if nd(k)]
    else:
        raise ValueError(
            f"unrecognized param_groups layout ({len(param_groups)} groups "
            f"with sizes {[len(g['params']) for g in param_groups]})")
    flat_idx = [i for g in param_groups for i in g["params"]]
    if len(flat_idx) != len(order):
        raise ValueError(
            f"optimizer indexes {len(flat_idx)} params but the state dict "
            f"implies {len(order)} trainable params — fixed_layers or "
            f"grouping mismatch")
    return dict(zip(flat_idx, order))


def _set_schedule_counts(opt_state, step: int):
    """Advance every LR-schedule counter to ``step``: optax wraps a callable
    learning rate in scale_by_schedule with its own count, which starts at 0
    on a fresh ``tx.init`` — without this, a resumed run re-executes the
    warmup ramp (first post-resume update = schedule(0) = 0.0)."""
    import optax

    def rec(node):
        if isinstance(node, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(
                count=jnp.asarray(step, node.count.dtype))
        if isinstance(node, tuple):
            vals = [rec(x) for x in node]
            return type(node)(*vals) if hasattr(node, "_fields") \
                else tuple(vals)
        return node

    return rec(opt_state)


def _replace_moment_states(opt_state, mu, nu, count: int):
    """Substitute imported first/second moments into an optax state tree
    (handles our chain/clip/MultiSteps nesting by recursing through
    tuples/namedtuples)."""
    import optax

    from .optimization import _AdamState, _RAdamState

    def cast_like(tmpl, tree):
        return jax.tree.map(
            lambda t, v: jnp.asarray(v, dtype=t.dtype), tmpl, tree)

    def rec(node):
        if isinstance(node, _AdamState):
            return _AdamState(cast_like(node.mu, mu),
                              cast_like(node.nu, nu))
        if isinstance(node, _RAdamState):
            return _RAdamState(jnp.asarray(count, node.count.dtype),
                               cast_like(node.mu, mu),
                               cast_like(node.nu, nu))
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                jnp.asarray(count, node.count.dtype),
                cast_like(node.mu, mu), cast_like(node.nu, nu))
        if isinstance(node, tuple):
            vals = [rec(x) for x in node]
            return type(node)(*vals) if hasattr(node, "_fields") \
                else tuple(vals)
        return node

    return rec(opt_state)


def resume_from_torch_tar(cfg: VoltaConfig, state, path: str):
    """Resume a volta_tpu train state mid-run from the reference's
    ``pytorch_ckpt_latest.tar`` (written by volta/train_utils.py:295-317,
    consumed by its resume() at :319-340): model weights through the
    importer, AdamW/RAdam first+second moments mapped per parameter
    (transposed alongside their dense kernels), and ``global_step`` into
    ``state.step`` — the warmup/decay schedule position follows from it.

    Returns ``(state, info)`` with info holding global_step / epoch_id /
    score / the tar's optimizer hyperparameters (caller should warn if its
    CLI hyperparameters differ — the tar does not configure us)."""
    obj = _tolerant_torch_load(path)
    if "model_state_dict" not in obj:
        raise ValueError(f"{path} has no model_state_dict — not a "
                         "reference checkpoint tar")
    msd = _normalize_keys(obj["model_state_dict"])
    new_vars, report = import_state_dict(cfg, {"params": state.params}, msd)
    if report["skipped"]:
        logger.warning("tar resume: %d params kept their current values: "
                       "%s...", len(report["skipped"]),
                       report["skipped"][:5])
    new_params = new_vars["params"]

    osd = obj.get("optimizer_state_dict") or {}
    opt_entries = osd.get("state") or {}
    new_opt = state.opt_state
    info = {"global_step": int(obj.get("global_step", 0)),
            "epoch_id": int(obj.get("epoch_id", -1)),
            "score": obj.get("score"),
            "hyperparams": {}}
    if opt_entries:
        idx2name = _optimizer_index_to_name(cfg, msd,
                                            osd.get("param_groups", []))
        mu_sd, nu_sd, steps = {}, {}, [0]
        for i, entry in opt_entries.items():
            name = idx2name[int(i)]
            mu_sd[name] = np.asarray(entry["exp_avg"])
            nu_sd[name] = np.asarray(entry["exp_avg_sq"])
            if "step" in entry:
                steps.append(int(entry["step"]))
        zeros = jax.tree.map(lambda p: np.zeros_like(np.asarray(p)),
                             state.params)
        mu_tree, mu_rep = import_state_dict(cfg, zeros, mu_sd)
        nu_tree, _ = import_state_dict(cfg, zeros, nu_sd)
        if mu_rep["unused"]:
            raise ValueError(
                f"optimizer moments with no parameter mapping: "
                f"{mu_rep['unused'][:5]}")
        new_opt = _replace_moment_states(state.opt_state, mu_tree, nu_tree,
                                         max(steps))
        g0 = (osd.get("param_groups") or [{}])[0]
        info["hyperparams"] = {k: g0[k] for k in
                               ("lr", "betas", "eps", "weight_decay",
                                "correct_bias") if k in g0}
    new_opt = _set_schedule_counts(new_opt, info["global_step"])
    state = state.replace(
        step=jnp.asarray(info["global_step"], state.step.dtype),
        params=new_params, opt_state=new_opt)
    return state, info


def cached_path(url_or_filename: str,
                cache_dir: Optional[str] = None) -> str:
    """Resolve a local path, file:// URL, or http(s)/s3 URL to a local file
    (reference: volta/utils.py:82-229).

    Remote URLs are cached under ``cache_dir`` (default
    ``~/.cache/volta_tpu``) keyed by a hash of the URL; an already-cached
    file is returned without touching the network. In offline environments
    the error names the exact cache path where the file can be placed
    manually.
    """
    import hashlib
    from urllib.parse import urlparse

    parsed = urlparse(url_or_filename)
    if parsed.scheme in ("", "file"):
        path = parsed.path if parsed.scheme == "file" else url_or_filename
        if not os.path.exists(path):
            raise FileNotFoundError(f"file {path} not found")
        return path
    if parsed.scheme not in ("http", "https", "s3"):
        raise ValueError(
            f"unable to parse {url_or_filename} as a URL or local path")

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "volta_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    fname = hashlib.sha256(url_or_filename.encode()).hexdigest()
    cache_path = os.path.join(cache_dir, fname)
    meta_path = cache_path + ".json"
    if os.path.exists(cache_path):
        return cache_path

    if parsed.scheme == "s3":
        try:
            import boto3  # noqa: F401
        except ImportError as e:
            raise OSError(
                f"{url_or_filename} is an S3 URL but boto3 is unavailable; "
                f"download it manually to {cache_path}") from e
        bucket, key = parsed.netloc, parsed.path.lstrip("/")
        boto3.resource("s3").Bucket(bucket).download_file(key, cache_path)
    else:
        import json as _json
        import urllib.request

        tmp = cache_path + ".tmp"
        try:
            with urllib.request.urlopen(url_or_filename, timeout=60) as r, \
                    open(tmp, "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            os.replace(tmp, cache_path)
            with open(meta_path, "w") as f:
                _json.dump({"url": url_or_filename}, f)
        except OSError as e:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise OSError(
                f"could not download {url_or_filename} "
                f"({e}); if this environment has no egress, place the file "
                f"at {cache_path} manually") from e
    return cache_path


FLAX_WEIGHTS_NAME = "flax_model.msgpack"


def save_pretrained(save_dir: str, cfg: VoltaConfig, params: Any) -> str:
    """Write a reloadable model-only bundle: ``config.json`` + the param
    pytree as msgpack (reference: volta/utils.py:250-305 save_pretrained,
    minus torch). ``from_pretrained`` accepts the directory."""
    from flax import serialization

    os.makedirs(save_dir, exist_ok=True)
    tree = params.get("params", params) if isinstance(params, dict) \
        else params
    tree = jax.tree.map(np.asarray, tree)
    with open(os.path.join(save_dir, FLAX_WEIGHTS_NAME), "wb") as f:
        f.write(serialization.to_bytes(tree))
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        f.write(cfg.to_json_string())
    return save_dir


def _load_flax_bundle(path: str, params: Any):
    from flax import serialization

    with open(os.path.join(path, FLAX_WEIGHTS_NAME), "rb") as f:
        raw = f.read()
    tree = params.get("params", params) if isinstance(params, dict) \
        else params
    restored = serialization.from_bytes(jax.tree.map(np.asarray, tree), raw)
    if isinstance(params, dict) and set(params) == {"params"}:
        return {"params": restored}
    return restored


def from_pretrained(cfg: VoltaConfig, params: Any, path: str, *,
                    from_hf: bool = False,
                    cache_dir: Optional[str] = None
                    ) -> Tuple[Any, Dict[str, Any]]:
    """Load pretrained weights onto ``params`` (a ``{"params": ...}``
    variables dict or bare param tree).

    Accepts torch ``.bin`` state dicts (VOLTA or HF naming, auto-detected),
    an Orbax checkpoint directory, a ``save_pretrained`` bundle, or an
    http(s)/s3 URL to a ``.bin`` (resolved through ``cached_path``).
    """
    if "://" in path or path.startswith("http"):
        path = cached_path(path, cache_dir)
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, FLAX_WEIGHTS_NAME)):
            return _load_flax_bundle(path, params), {
                "loaded": ["<flax-bundle>"], "skipped": [], "unused": []}
        if not os.path.exists(os.path.join(path, "data.mdb")):
            restored = _restore_raw(path)
            new = _overlay_params(params, restored)
            return new, {"loaded": ["<orbax>"], "skipped": [], "unused": []}
    sd = load_torch_state_dict(path)
    if not from_hf:
        # auto-detect HF BERT checkpoints by their layer naming
        from_hf = any(".attention.self.query." in k for k in sd)
    return import_state_dict(cfg, params, sd, from_hf=from_hf)


def _restore_raw(ckpt_dir: str):
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mgr:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        return mgr.restore(step)


def _overlay_params(params: Any, restored: Any):
    """Pull the parameter subtree out of a restored train state and overlay
    it onto ``params`` (handling the {'params': ...} wrapper)."""
    src = restored
    if isinstance(src, dict) and "params" in src:
        src = src["params"]
    if isinstance(params, dict) and "params" in params and \
            set(params) == {"params"}:
        return {"params": _merge(params["params"], src)}
    return _merge(params, src)


def _merge(dst, src):
    if isinstance(dst, dict):
        return {k: _merge(v, src[k]) if k in src else v
                for k, v in dst.items()}
    return np.asarray(src, dtype=np.asarray(dst).dtype) \
        if src is not None else dst


# ----------------------------------------------------------- orbax bundles
def save_train_state(ckpt_dir: str, step: int, state: Any, *,
                     keep: int = 3) -> None:
    """Save the full train state under ``ckpt_dir/<step>``; async-capable."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(
            ckpt_dir, options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True)) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mgr:
        return mgr.latest_step()


def restore_train_state(ckpt_dir: str, target: Any,
                        step: Optional[int] = None) -> Tuple[Any, int]:
    """Restore train state; ``target`` provides the pytree structure."""
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        state = mgr.restore(step, args=ocp.args.StandardRestore(target))
    return state, step
