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
        loss = jnp.mean(cross_entropy(logit, target))
        score = jnp.sum(jnp.argmax(logit, axis=1) == target)
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
