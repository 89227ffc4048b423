"""Task orchestration: YAML task configs, batch process reshapes, and
per-task-type loss/score functions.

reference: volta/task_utils.py. Batches are dicts of numpy/jax arrays with
the reference's field names (features, spatials, image_mask, question,
target, input_mask, segment_ids, question_id [, multi_choice_ids]).

The ``process`` reshapes (normal / expand / retrieval / nlvr / dialog,
reference: volta/task_utils.py:149-232) are pure shape transforms executed
inside the jitted step; losses/scores are pure jnp functions
(reference: volta/task_utils.py:238-279).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from .losses import binary_cross_entropy_with_logits


# ------------------------------------------------------------------ config
def load_task_config(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f)


def task_key(task_id: str) -> str:
    return task_id if task_id.startswith("TASK") else "TASK" + task_id


def make_tokenizer(bert_model: str, do_lower_case: bool = True,
                   vocab_file: str = None):
    if "roberta" in bert_model:
        from .data.bpe import RobertaTokenizer

        return RobertaTokenizer.from_pretrained(vocab_file or bert_model)
    from .data.tokenization import BertTokenizer

    if vocab_file:
        return BertTokenizer(vocab_file, do_lower_case)
    return BertTokenizer.from_pretrained(bert_model, do_lower_case)


def _build_dataset(registry, cfg, tc, tokenizer, split_key, ann_key,
                   readers, bert_model, eval_mode=False):
    from .data.features_reader import ImageFeaturesReader

    name = tc["name"]
    extra = {}
    if "num_labels" in tc:
        import inspect

        if "num_labels" in inspect.signature(
                registry[name].__init__).parameters:
            # answer-space size from the task yml, for datasets that take
            # it directly (VisMadLibs) rather than from answer pickles
            extra["num_labels"] = tc["num_labels"]
    return registry[name](
        task=name,
        **extra,
        dataroot=tc["dataroot"],
        annotations_jsonpath=tc.get(ann_key, ""),
        split=tc[split_key],
        image_features_reader=readers[0],
        gt_image_features_reader=readers[1],
        tokenizer=tokenizer,
        bert_model=bert_model,
        padding_index=0,
        max_seq_length=tc["max_seq_length"],
        max_region_num=tc["max_region_num"],
        num_locs=cfg.num_locs,
        add_global_imgfeat=cfg.add_global_imgfeat,
        append_mask_sep=(cfg.fusion_method == "vl-bert_vqa"),
    )


def _make_readers(cfg, tc, in_memory=False):
    from .data.features_reader import ImageFeaturesReader

    out = []
    for key in ("features_h5path1", "features_h5path2"):
        path = tc.get(key, "")
        out.append(ImageFeaturesReader(
            path, num_locs=cfg.num_locs,
            add_global_imgfeat=cfg.add_global_imgfeat,
            feature_size=cfg.v_feature_size, in_memory=in_memory)
            if path else None)
    return out


def load_dataset(args, cfg, task_cfg: Dict[str, Any], task_id: str,
                 split: str = "trainval"):
    """Build train/val datasets + loaders for one task
    (reference: volta/task_utils.py:290-371)."""
    import jax

    from .data.datasets import DatasetMapTrain
    from .data.loader import DataLoader

    tokenizer = make_tokenizer(args.bert_model, args.do_lower_case,
                               getattr(args, "vocab_file", None))
    task = task_key(task_id)
    tc = task_cfg[task]
    readers = _make_readers(cfg, tc, getattr(args, "in_memory", False))
    n_hosts = jax.process_count()
    batch_size = tc["batch_size"] // args.grad_acc_steps // n_hosts

    packed = getattr(args, "in_memory", False)
    num_procs = getattr(args, "num_worker_procs", 0)
    feat_dtype = "bfloat16" if getattr(cfg, "compute_dtype", "") == \
        "bfloat16" else "float32"
    out = {"task": task, "batch_size": batch_size}
    if "train" in split:
        ds = _build_dataset(DatasetMapTrain, cfg, tc, tokenizer,
                            "train_split", "train_annotations_jsonpath",
                            readers, args.bert_model)
        if packed and hasattr(ds, "enable_packed"):
            ds.enable_packed(feat_dtype=feat_dtype)
        out["train_dataset"] = ds
        out["train_loader"] = DataLoader(
            ds, batch_size, shuffle=True, seed=args.seed,
            drop_last=True, num_workers=args.num_workers,
            num_shards=n_hosts, shard_index=jax.process_index(),
            num_procs=num_procs)
    if "val" in split:
        ds = _build_dataset(DatasetMapTrain, cfg, tc, tokenizer,
                            "val_split", "val_annotations_jsonpath",
                            readers, args.bert_model)
        if packed and hasattr(ds, "enable_packed"):
            ds.enable_packed(feat_dtype=feat_dtype)
        out["val_dataset"] = ds
        out["val_loader"] = DataLoader(
            ds, batch_size, shuffle=False, drop_last=True,
            num_workers=2, num_shards=n_hosts,
            shard_index=jax.process_index())
    return out


def load_dataset_eval(args, cfg, task_cfg: Dict[str, Any], task_id: str):
    """Eval-split dataset + loader (reference: volta/task_utils.py:374-426)."""
    import jax

    from .data.datasets import DatasetMapEval
    from .data.loader import DataLoader

    tokenizer = make_tokenizer(args.bert_model, args.do_lower_case,
                               getattr(args, "vocab_file", None))
    task = task_key(task_id)
    tc = dict(task_cfg[task])
    if getattr(args, "split", ""):
        tc["val_split"] = args.split
    readers = _make_readers(cfg, tc, getattr(args, "in_memory", False))
    batch_size = tc.get("eval_batch_size", getattr(args, "batch_size", 32))
    ds = _build_dataset(DatasetMapEval, cfg, tc, tokenizer, "val_split",
                        "val_annotations_jsonpath", readers,
                        args.bert_model, eval_mode=True)
    loader = DataLoader(ds, batch_size, shuffle=False, drop_last=False,
                        num_workers=args.num_workers)
    return {"task": task, "batch_size": batch_size, "dataset": ds,
            "loader": loader}


# --------------------------------------------------------------- processes
def _flat2(x):
    return x.reshape((-1,) + x.shape[2:])


def process_batch(task_cfg: Dict[str, Any], batch: Dict[str, Any]
                  ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Apply the task's ``process`` reshape; returns (model_inputs, info).

    info carries static sizes needed by the loss (num_options etc.).
    """
    process = task_cfg.get("process", "normal")
    feats, spatials = batch["features"], batch["spatials"]
    image_mask = batch["image_mask"]
    question = batch["question"]
    input_mask, segment_ids = batch["input_mask"], batch["segment_ids"]
    info = {"batch_size": feats.shape[0], "num_options": 1}

    if process == "expand":
        # one image tiled over the question options (VCR)
        # reference: volta/task_utils.py:185-208
        num_options = question.shape[1]
        nb = feats.shape[1]
        def tile(x):
            x = jnp.broadcast_to(x[:, None], (x.shape[0], num_options) + x.shape[1:])
            return x.reshape((-1,) + x.shape[2:])
        feats, spatials, image_mask = tile(feats), tile(spatials), tile(image_mask)
        question, input_mask, segment_ids = map(
            _flat2, (question, input_mask, segment_ids))
        info["num_options"] = num_options
    elif process == "retrieval":
        # flatten the 4-way pos/neg dim (reference: volta/task_utils.py:210-218)
        info["num_options"] = question.shape[1]
        feats, spatials, image_mask, question, input_mask, segment_ids = map(
            _flat2, (feats, spatials, image_mask, question, input_mask,
                     segment_ids))
    elif process == "nlvr":
        # split 2x36 regions into two images, duplicate the sentence
        # (reference: volta/task_utils.py:220-232)
        b = feats.shape[0]
        feats = feats.reshape(b * 2, feats.shape[1] // 2, feats.shape[2])
        spatials = spatials.reshape(b * 2, spatials.shape[1] // 2,
                                    spatials.shape[2])
        image_mask = image_mask.reshape(b * 2, image_mask.shape[1] // 2)
        def dup(x):
            return jnp.repeat(x, 2, axis=0) if hasattr(x, "shape") else x
        question, input_mask, segment_ids = map(
            dup, (question, input_mask, segment_ids))
    elif process == "dialog":
        # rounds x options expansion (reference: volta/task_utils.py:149-183)
        nround, num_options = question.shape[1], question.shape[2]
        b = feats.shape[0]
        nb = feats.shape[1]
        def tile(x):
            x = jnp.broadcast_to(
                x[:, None, None],
                (b, nround, num_options) + x.shape[1:])
            return x.reshape((-1,) + x.shape[3:])
        feats, spatials, image_mask = tile(feats), tile(spatials), tile(image_mask)
        question = question.reshape(-1, question.shape[-1])
        input_mask = input_mask.reshape(-1, input_mask.shape[-1])
        segment_ids = segment_ids.reshape(-1, segment_ids.shape[-1])
        info["num_options"] = num_options
        info["batch_size"] = b * nround

    inputs = dict(input_ids=question, image_feat=feats, image_loc=spatials,
                  token_type_ids=segment_ids, attention_mask=input_mask,
                  image_attention_mask=image_mask)
    return inputs, info


def process_row_index(task_cfg: Dict[str, Any], batch: Dict[str, Any]
                      ) -> Dict[str, Any]:
    """Per-row provenance for process-expanded model batches.

    Mirrors ``process_batch``'s reshapes: for every row of the expanded
    model batch, which host-batch entry it came from (``row_qid_index``,
    an index into the batch's ``question_id``), which option
    (``row_option`` — VCR answer choice / retrieval way / NLVR2 image),
    and which dialog round (``row_round``). Written into the --dump_attn
    npz so visualization consumers can reconstruct per-question alignment
    without knowing the process semantics."""
    import numpy as np

    process = task_cfg.get("process", "normal")
    b = np.asarray(batch["features"]).shape[0]
    q = np.asarray(batch["question"])
    if process in ("expand", "retrieval"):
        no = q.shape[1]
        r = np.arange(b * no)
        return {"row_qid_index": r // no, "row_option": r % no}
    if process == "nlvr":
        r = np.arange(b * 2)
        return {"row_qid_index": r // 2, "row_option": r % 2}
    if process == "dialog":
        nround, no = q.shape[1], q.shape[2]
        r = np.arange(b * nround * no)
        return {"row_qid_index": r // (nround * no),
                "row_round": (r // no) % nround,
                "row_option": r % no}
    return {"row_qid_index": np.arange(b)}


# ------------------------------------------------------------- loss/score
def soft_score_with_logits(logits, targets):
    """One-hot(argmax) . soft targets (reference:
    volta/task_utils.py:429-434 compute_score_with_logits)."""
    pred = jnp.argmax(logits, axis=1)
    return jnp.take_along_axis(targets, pred[:, None], axis=1)[:, 0]


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def task_loss_and_score(task_type: str, prediction, batch, info,
                        loss_name: str = "BCEWithLogitLoss"):
    """Training loss and batch score per task type
    (reference: volta/task_utils.py:238-279)."""
    target = batch["target"]
    bsz = info["batch_size"]
    if task_type in ("VL-classifier", "VL-classifier-GQA"):
        loss = binary_cross_entropy_with_logits(prediction, target) \
            * target.shape[1]
        score = jnp.sum(soft_score_with_logits(prediction, target))
    elif task_type == "VL-logit":
        logit = prediction.reshape(bsz, info["num_options"])
        # dialog process delivers [b, rounds] labels; flatten to match the
        # rounds-expanded rows (reference: volta/task_utils.py:155)
        tgt = target.reshape(-1)
        loss = jnp.mean(cross_entropy(logit, tgt))
        score = jnp.sum(jnp.argmax(logit, axis=1) == tgt)
    elif task_type == "V-logit":
        loss = binary_cross_entropy_with_logits(prediction, target) \
            * target.shape[1]
        sel = jnp.argmax(prediction[..., 0], axis=1)
        picked = jnp.take_along_axis(target[..., 0], sel[:, None], axis=1)
        score = jnp.sum(picked > 0.5)
    elif task_type == "V-logit-mc":
        # gather candidate boxes among the 101.. trailing region slots
        # (reference: volta/task_utils.py:261-269)
        mc = batch["multi_choice_ids"]
        logit = prediction[:, 101:, 0]
        logit = jnp.take_along_axis(logit, mc, axis=1)[..., None]
        loss = binary_cross_entropy_with_logits(logit, target) \
            * target.shape[1]
        score = jnp.sum(jnp.argmax(logit[..., 0], 1) ==
                        jnp.argmax(target[..., 0], 1))
    elif task_type == "VL-binary-classifier":
        loss = binary_cross_entropy_with_logits(prediction, target)
        score = jnp.sum(soft_score_with_logits(prediction, target))
    elif task_type == "VL-tri-classifier":
        if loss_name == "CrossEntropyLoss":
            loss = jnp.mean(cross_entropy(prediction, target))
            score = jnp.sum(jnp.argmax(prediction, 1) == target)
        else:
            loss = binary_cross_entropy_with_logits(prediction, target)
            score = jnp.sum(soft_score_with_logits(prediction, target))
    else:
        raise ValueError(f"Undefined task type: {task_type}")
    return loss, score
