"""Training utilities: metrics logging, layer freezing, parameter summaries.

reference: volta/train_utils.py (tbLogger, freeze_layers,
summary_parameters, save/resume). Checkpointing itself lives in
volta_tpu.checkpoint (Orbax); the logger state is a plain dict so it can be
bundled into checkpoints like the reference pickles its tbLogger
(reference: train_utils.py:295-316).
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class MetricsLogger:
    """Per-task running loss/score/lr accumulators with TensorBoard and
    plain-text output (reference: volta/train_utils.py:18-247)."""

    def __init__(self, log_dir: Optional[str] = None,
                 txt_name: str = "out.txt", period: int = 20,
                 enabled: bool = True):
        self.period = period
        self.enabled = enabled and jax.process_index() == 0
        self.log_dir = log_dir
        self._tb = None
        self._txt = None
        if self.enabled and log_dir:
            os.makedirs(log_dir, exist_ok=True)
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None
            self._txt = open(os.path.join(log_dir, txt_name), "a")
        self._acc = defaultdict(lambda: defaultdict(float))
        self._cnt = defaultdict(int)
        self._val = defaultdict(lambda: defaultdict(float))
        self._val_cnt = defaultdict(int)

    # --------------------------------------------------------------- state
    def state_dict(self) -> Dict[str, Any]:
        return {"acc": {k: dict(v) for k, v in self._acc.items()},
                "cnt": dict(self._cnt)}

    def load_state_dict(self, state: Dict[str, Any]):
        for k, v in state.get("acc", {}).items():
            self._acc[k].update(v)
        self._cnt.update(state.get("cnt", {}))

    # --------------------------------------------------------------- train
    def scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def step_train(self, epoch: int, step: int, loss: float, score: float,
                   lr: float, task: str, split: str = "train"):
        if not self.enabled:
            return
        a = self._acc[task]
        a["loss"] += loss
        a["score"] += score
        self._cnt[task] += 1
        self.scalar(f"{task}/{split}/loss", loss, step)
        self.scalar(f"{task}/{split}/score", score, step)
        self.scalar(f"{task}/{split}/lr", lr, step)
        if self._cnt[task] % self.period == 0:
            self.show_train(epoch, step, task)

    def show_train(self, epoch: int, step: int, task: str):
        n = max(self._cnt[task], 1)
        a = self._acc[task]
        msg = (f"[{time.strftime('%X')}] epoch {epoch} step {step} "
               f"{task} loss {a['loss']/n:.4f} score {a['score']/n:.4f}")
        self._emit(msg)
        self._acc[task] = defaultdict(float)
        self._cnt[task] = 0

    def step_train_cc(self, epoch: int, step: int, masked_t: float,
                      masked_v: float, itm: float, lr: float,
                      task: str = "TASK0", split: str = "train"):
        if not self.enabled:
            return
        a = self._acc[task]
        a["masked_t"] += masked_t
        a["masked_v"] += masked_v
        a["itm"] += itm
        self._cnt[task] += 1
        for name, v in (("masked_t", masked_t), ("masked_v", masked_v),
                        ("itm", itm), ("lr", lr)):
            self.scalar(f"{task}/{split}/{name}", v, step)

    def show_train_cc(self, epoch: int, step: int, task: str = "TASK0"):
        n = max(self._cnt[task], 1)
        a = self._acc[task]
        self._emit(f"[{time.strftime('%X')}] epoch {epoch} step {step} CC "
                   f"masked_t {a['masked_t']/n:.4f} "
                   f"masked_v {a['masked_v']/n:.4f} itm {a['itm']/n:.4f}")
        self._acc[task] = defaultdict(float)
        self._cnt[task] = 0

    # ----------------------------------------------------------------- val
    def step_val(self, loss: float, score: float, batch_size: int,
                 task: str):
        v = self._val[task]
        v["loss"] += loss
        v["score"] += score
        v["n"] += batch_size
        self._val_cnt[task] += 1

    def show_val(self, epoch: int, step: int, task: str) -> float:
        v = self._val[task]
        n = max(v["n"], 1)
        nb = max(self._val_cnt[task], 1)
        score = v["score"] / n
        self._emit(f"[{time.strftime('%X')}] VAL epoch {epoch} {task} "
                   f"loss {v['loss']/nb:.4f} score {score*100:.2f}")
        self.scalar(f"{task}/val/loss", v["loss"] / nb, step)
        self.scalar(f"{task}/val/score", score, step)
        self._val[task] = defaultdict(float)
        self._val_cnt[task] = 0
        return score

    def _emit(self, msg: str):
        if not self.enabled:
            return
        print(msg, flush=True)
        if self._txt is not None:
            self._txt.write(msg + "\n")
            self._txt.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._txt is not None:
            self._txt.close()


def fetch_metric_window(pending, keys):
    """Fetch a window of per-step metric dicts in ONE device transfer.

    A per-scalar ``float()`` costs a full host<->device round trip; over a
    remote-TPU link (~30 ms RTT) a 20-step x 3-metric window fetched
    scalar-by-scalar serialises the loop at ~90 ms/step of pure latency.
    Stacking on device and pulling one buffer amortises that to a single
    round trip per window. Returns ``[(tag, v0, v1, ...), ...]`` floats in
    ``keys`` order for each ``(tag, metrics)`` in ``pending``.
    """
    if not pending:
        return []
    fused = np.asarray(jnp.stack(
        [jnp.asarray(m[k], jnp.float32) for _, m in pending for k in keys]))
    k = len(keys)
    return [(tag,) + tuple(float(v) for v in fused[i * k:(i + 1) * k])
            for i, (tag, _) in enumerate(pending)]


def host_schedule(sched):
    """Wrap an optax schedule so logging its lr never touches the device.

    Schedules are built from jnp ops, so calling one eagerly places tiny
    computations on the default (TPU) backend — one device round trip per
    logged step. Evaluate on the host CPU backend instead; falls back to
    the default backend if no CPU devices exist."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        return lambda s: float(sched(s))

    def fn(s):
        with jax.default_device(cpu):
            return float(sched(s))
    return fn


def freeze_mask(params, fixed_layers: Iterable[str]):
    """True where the parameter trains; substring match on the joined path
    (reference: volta/train_utils.py:250-255)."""
    fixed = list(fixed_layers or [])

    def decide(path, _):
        name = ".".join(p.key for p in path if hasattr(p, "key"))
        return not any(f in name for f in fixed)

    return jax.tree_util.tree_map_with_path(decide, params)


def apply_freeze(tx, params, fixed_layers):
    """Wrap an optimizer so frozen parameters receive zero updates."""
    import optax

    if not fixed_layers:
        return tx
    trainable = freeze_mask(params, fixed_layers)
    frozen = jax.tree.map(lambda t: not t, trainable)
    return optax.chain(optax.masked(optax.set_to_zero(), frozen), tx)


def summary_parameters(params):
    """Parameter table (reference: volta/train_utils.py:265-292)."""
    rows = []
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = ".".join(p.key for p in path if hasattr(p, "key"))
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        total += n
        rows.append((name, tuple(getattr(leaf, "shape", ())), n))
    if jax.process_index() == 0:
        width = max(len(r[0]) for r in rows) if rows else 10
        for name, shape, n in rows:
            logger.info("%s %s %d", name.ljust(width), shape, n)
        logger.info("total parameters: %d (%.1fM)", total, total / 1e6)
    return total


def save_command(output_dir: str, args, config=None):
    """Dump CLI args + model config next to the run
    (reference: train_task.py:158-162)."""
    if jax.process_index() != 0:
        return
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "command.txt"), "w") as f:
        f.write(json.dumps(vars(args), indent=2, default=str) + "\n")
        if config is not None:
            f.write(config.to_json_string())


def set_seed(seed: int):
    np.random.seed(seed)
    import random
    random.seed(seed)


def init_classifier_from_answers(params, task: str, dataset):
    """Initialise the task classifier's final projection from the mean
    word embedding of each answer string
    (reference: train_task.py:182-202). No-op with a warning when the
    classifier width differs from the text hidden size."""
    emb = params
    for key in ("bert", "embeddings", "word_embeddings", "embedding"):
        emb = emb[key]
    word_embeddings = np.asarray(emb)
    tok = dataset._tokenizer
    rows = []
    for answer, _label in sorted(dataset.ans2label.items()):
        ids = tok.convert_tokens_to_ids(tok.tokenize(answer))
        if ids:
            rows.append(word_embeddings[np.asarray(ids)].mean(0))
        else:
            rows.append(word_embeddings[tok.convert_tokens_to_ids(
                [tok.unk_token])[0]])
    table = np.stack(rows)  # [num_labels, hidden]
    clf = params.get(f"clf_{task}")
    if clf is None or "dense2" not in clf:
        logger.warning("embed_clf: no SimpleClassifier head for %s", task)
        return params
    kernel = clf["dense2"]["kernel"]
    if kernel.shape != table.T.shape:
        logger.warning(
            "embed_clf: classifier kernel %s != answer embeddings %s; "
            "skipping init", kernel.shape, table.T.shape)
        return params
    clf["dense2"]["kernel"] = jnp.asarray(table.T, dtype=kernel.dtype) \
        if hasattr(kernel, "dtype") else table.T
    logger.info("initialised %s classifier from %d answer embeddings",
                task, table.shape[0])
    return params
