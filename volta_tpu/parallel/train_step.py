"""Jitted train/eval steps over the device mesh.

One ``jax.jit`` with donated train state replaces the reference's
DataParallel/apex-DDP machinery (reference: train_task.py:246-291,
train_concap.py:269-311): the batch is sharded on the mesh ``data`` axis and
XLA emits the gradient psum over ICI; loss scaling for gradient accumulation
is ``optax.MultiSteps`` inside the optimizer chain.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import pretraining_losses
from ..task_utils import process_batch, task_loss_and_score
from .mesh import batch_sharding


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: Any


def create_train_state(rng, params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), rng=rng)


def _widen_wire(batch: Dict) -> Dict:
    """Widen narrow wire dtypes back to int32 on device. Device-store
    batches ship int16 token/label ids and int8 masks/segments to halve
    the host->device link bytes (data/datasets/base.py:narrow_wire_text);
    widening first keeps every downstream op — embedding gathers, additive
    masks, loss denominators — identical to the dense path bit-for-bit."""
    def w(x):
        if hasattr(x, "dtype") and x.dtype in (jnp.int8, jnp.int16):
            return x.astype(jnp.int32)
        return x

    return {k: w(v) for k, v in batch.items()}


# ------------------------------------------------------------- fine-tuning
def materialize_store_batch(store: Dict, batch: Dict, num_labels: int
                            ) -> Dict:
    """Expand a device-store mini-batch into the full batch layout.

    ``store`` holds the whole packed dataset's region features in HBM;
    the host ships only row indices, token ids and sparse targets per step
    (~50 KB instead of ~40 MB), and the gathers/scatter run at HBM
    bandwidth inside the jitted step. TPU-native replacement for shipping
    dense features over a slow host link every step.
    """
    batch = _widen_wire(batch)
    rows = batch["store_rows"]
    full = {k2: v for k2, v in batch.items()
            if k2 not in ("store_rows", "target_labels", "target_scores")}
    if rows.ndim == 2:
        # image-set layout (NLVR2 pairs): gather every image of the sample
        # and concatenate on the region axis, reproducing the dense
        # dataset's [b, m*R] layout that the ``nlvr`` process splits back
        # (reference: volta/datasets/nlvr2_dataset.py:192-206)
        b, m = rows.shape
        flat = rows.reshape(-1)
        f = jnp.take(store["feat"], flat, axis=0)
        full["features"] = f.reshape(b, m * f.shape[1], f.shape[2])
        l = jnp.take(store["loc"], flat, axis=0)
        full["spatials"] = l.reshape(b, m * l.shape[1], l.shape[2])
        mk = jnp.take(store["mask"], flat, axis=0)
        full["image_mask"] = mk.reshape(b, m * mk.shape[1])
    else:
        full["features"] = jnp.take(store["feat"], rows, axis=0)
        full["spatials"] = jnp.take(store["loc"], rows, axis=0)
        full["image_mask"] = jnp.take(store["mask"], rows, axis=0)
    if "target_labels" in batch:
        labels = batch["target_labels"]      # [b, K], -1 padded
        scores = batch["target_scores"]      # [b, K]
        b, k = labels.shape
        valid = labels >= 0
        target = jnp.zeros((b, num_labels), jnp.float32)
        target = target.at[
            jnp.repeat(jnp.arange(b), k),
            jnp.where(valid, labels, 0).reshape(-1)].max(
            jnp.where(valid, scores, 0.0).reshape(-1).astype(jnp.float32))
        full["target"] = target
    # else: the dataset ships its (small) dense target directly
    return full


def make_task_train_step(model, tx, task_cfg: Dict, task_id: str,
                         mesh=None, donate: bool = True,
                         store: Dict = None,
                         compiler_options: Dict = None) -> Callable:
    """Build the jitted fine-tuning step for one task. With ``store``
    (device-resident packed features), batches carry indices + sparse
    targets instead of dense features. ``compiler_options`` (e.g.
    ``{"xla_tpu_scoped_vmem_limit_kib": "65536"}``) are forwarded to the
    backend compiler via the AOT path — the only route TPU-side XLA
    knobs can take here, since client XLA_FLAGS abort at env parse
    (tools/probe_compiler_options.py)."""
    tc = task_cfg[task_id]
    ttype, loss_name = tc["type"], tc.get("loss", "BCEWithLogitLoss")
    num_labels = tc.get("num_labels", 0)

    def step_fn(state: TrainState, store_arg: Dict, batch: Dict):
        rng, dropout_rng = jax.random.split(state.rng)
        if store_arg is not None:
            batch_full = materialize_store_batch(store_arg, batch,
                                                 num_labels)
        else:
            batch_full = batch

        def loss_fn(params):
            inputs, info = process_batch(tc, batch_full)
            pred, _ = model.apply(
                {"params": params}, inputs["input_ids"], inputs["image_feat"],
                inputs["image_loc"], task_id, inputs["token_type_ids"],
                inputs["attention_mask"], inputs["image_attention_mask"],
                deterministic=False, rngs={"dropout": dropout_rng})
            loss, score = task_loss_and_score(ttype, pred, batch_full, info,
                                              loss_name)
            return loss, (score, info["batch_size"])

        (loss, (score, bsz)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, rng=rng)
        metrics = {"loss": loss, "score": score / bsz}
        return new_state, metrics

    kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is not None:
        kw["in_shardings"] = (None, None, batch_sharding(mesh))
    jitted = jax.jit(_with_mesh(step_fn, mesh), **kw)
    if compiler_options:
        aot = {}

        def _call(state, store_arg, batch):
            if "c" not in aot:
                aot["c"] = jitted.lower(state, store_arg, batch).compile(
                    compiler_options=compiler_options)
            return aot["c"](state, store_arg, batch)
    else:
        _call = jitted
    if store is None:
        return lambda state, batch: _call(state, None, batch)
    return lambda state, batch: _call(state, store, batch)


def make_task_eval_step(model, task_cfg: Dict, task_id: str, mesh=None
                        ) -> Callable:
    tc = task_cfg[task_id]
    ttype, loss_name = tc["type"], tc.get("loss", "BCEWithLogitLoss")

    def eval_fn(params, batch):
        inputs, info = process_batch(tc, batch)
        pred, _ = model.apply(
            {"params": params}, inputs["input_ids"], inputs["image_feat"],
            inputs["image_loc"], task_id, inputs["token_type_ids"],
            inputs["attention_mask"], inputs["image_attention_mask"],
            deterministic=True)
        loss, score = task_loss_and_score(ttype, pred, batch, info, loss_name)
        return {"loss": loss, "score": score,
                "batch_size": info["batch_size"], "prediction": pred}

    if mesh is not None:
        return jax.jit(_with_mesh(eval_fn, mesh),
                       in_shardings=(None, batch_sharding(mesh)))
    return jax.jit(eval_fn)


# -------------------------------------------------------------- pretraining
def materialize_cc_store_batch(store: Dict, batch: Dict, cfg) -> Dict:
    """Expand a CC device-store mini-batch: gather features/targets from
    HBM, apply the host-drawn MRM masks, compute the overlap co-mask and
    the global mean feature on device. Mirrors
    ConceptCapDataset._get_packed_batch exactly (equivalence-tested)."""
    batch = _widen_wire(batch)
    rows = batch["store_rows"]
    do_r = batch["mrm_mask"]
    zero = batch["mrm_zero"]
    feat = jnp.take(store["feat"], rows, axis=0)
    feat = feat * (~zero[:, :, None]).astype(feat.dtype)
    nb = jnp.take(store["nb"], rows, axis=0)
    R = feat.shape[1]
    valid_r = jnp.arange(R)[None, :] < nb[:, None]
    ovl = jnp.take(store["ovl"], rows, axis=0)
    masked_lbl = (do_r[:, :, None] & ovl).any(axis=1)
    loc = jnp.take(store["loc"], rows, axis=0)
    image_mask = valid_r.astype(jnp.int32)

    full = {k: v for k, v in batch.items()
            if k not in ("store_rows", "mrm_mask", "mrm_zero")}
    full["image_label"] = jnp.where(do_r, 1, -1).astype(jnp.int32)
    # per-objective arrays may be pruned from the store (see
    # ConceptCapDataset.device_store_arrays targets=...)
    for out_key, store_key in (("image_cls", "cls"), ("obj_labels", "obj_l"),
                               ("obj_confs", "obj_c"),
                               ("attr_labels", "attr_l"),
                               ("attr_confs", "attr_c")):
        if store_key in store:
            full[out_key] = jnp.take(store[store_key], rows, axis=0)
    full["image_id"] = rows

    if cfg.add_global_imgfeat:
        b = feat.shape[0]
        count = jnp.maximum((valid_r & ~masked_lbl).sum(1), 1)[:, None]
        g_feat = (feat.astype(jnp.float32).sum(1)
                  / count).astype(feat.dtype)[:, None]
        g_loc = jnp.tile(jnp.asarray(
            [[[0, 0, 1, 1] + [1] * (cfg.num_locs - 4)]], jnp.float32),
            (b, 1, 1))
        g_mask = jnp.ones((b, 1), jnp.int32)
        order = ((g_feat, feat), (g_loc, loc), (g_mask, image_mask)) \
            if cfg.add_global_imgfeat == "first" else \
            ((feat, g_feat), (loc, g_loc), (image_mask, g_mask))
        full["image_feat"] = jnp.concatenate(order[0], 1)
        full["image_loc"] = jnp.concatenate(order[1], 1)
        full["image_mask"] = jnp.concatenate(order[2], 1)
    else:
        full["image_feat"] = feat
        full["image_loc"] = loc
        full["image_mask"] = image_mask
    return full


def make_pretrain_step(model, tx, cfg, objective: int = 0, mesh=None,
                       donate: bool = True, store: Dict = None) -> Callable:
    """CC pretraining step: MLM + masked-region + ITM
    (reference: train_concap.py:269-311, incl. the objective-1 label masking
    at train_concap.py:279-284 and objective-2 ITM zeroing). With ``store``
    (device-resident packed CC arrays), batches carry indices + host mask
    draws instead of dense features/targets."""

    def step_fn(state: TrainState, store_arg: Dict, batch: Dict):
        rng, dropout_rng, nce_rng = jax.random.split(state.rng, 3)
        if store_arg is not None:
            batch = materialize_cc_store_batch(store_arg, batch, cfg)

        def loss_fn(params):
            lm_labels = batch["lm_label_ids"]
            image_label = batch["image_label"]
            is_match = batch["is_match"]
            if objective == 1:
                keep = (is_match == 0)[:, None]
                lm_labels = jnp.where(keep, lm_labels, -1)
                image_label = jnp.where(keep, image_label, -1)
            out = model.apply(
                {"params": params}, batch["input_ids"], batch["image_feat"],
                batch["image_loc"], batch["segment_ids"], batch["input_mask"],
                batch["image_mask"], deterministic=False,
                rngs={"dropout": dropout_rng})
            mlm, mrm, itm = pretraining_losses(
                cfg, out, masked_lm_labels=lm_labels,
                image_label=image_label,
                image_cls=batch.get("image_cls"),
                image_feat=_strip_global(cfg, batch["image_feat"]),
                obj_labels=batch.get("obj_labels"),
                obj_confs=batch.get("obj_confs"),
                attr_labels=batch.get("attr_labels"),
                attr_confs=batch.get("attr_confs"),
                next_sentence_label=is_match, rng=nce_rng)
            if objective == 2:
                itm = itm * 0.0
            return mlm + mrm + itm, (mlm, mrm, itm)

        (loss, (mlm, mrm, itm)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, rng=rng)
        return new_state, {"loss": loss, "masked_t": mlm, "masked_v": mrm,
                           "itm": itm}

    kw = {"donate_argnums": (0,)} if donate else {}
    if mesh is not None:
        kw["in_shardings"] = (None, None, batch_sharding(mesh))
    jitted = jax.jit(_with_mesh(step_fn, mesh), **kw)
    if store is None:
        return lambda state, batch: jitted(state, None, batch)
    return lambda state, batch: jitted(state, store, batch)


def make_pretrain_eval_step(model, cfg, mesh=None) -> Callable:
    """Deterministic pretraining loss evaluation (no update, no dropout)."""

    def eval_fn(params, batch):
        out = model.apply(
            {"params": params}, batch["input_ids"], batch["image_feat"],
            batch["image_loc"], batch["segment_ids"], batch["input_mask"],
            batch["image_mask"], deterministic=True)
        mlm, mrm, itm = pretraining_losses(
            cfg, out, masked_lm_labels=batch["lm_label_ids"],
            image_label=batch["image_label"],
            image_cls=batch.get("image_cls"),
            image_feat=_strip_global(cfg, batch["image_feat"]),
            obj_labels=batch.get("obj_labels"),
            obj_confs=batch.get("obj_confs"),
            attr_labels=batch.get("attr_labels"),
            attr_confs=batch.get("attr_confs"),
            next_sentence_label=batch["is_match"],
            rng=jax.random.PRNGKey(0))
        return {"loss": mlm + mrm + itm, "masked_t": mlm, "masked_v": mrm,
                "itm": itm}

    if mesh is not None:
        return jax.jit(_with_mesh(eval_fn, mesh),
                       in_shardings=(None, batch_sharding(mesh)))
    return jax.jit(eval_fn)


def _strip_global(cfg, image_feat):
    """Regression targets exclude the synthetic global feature row
    (reference: volta/encoders.py:1082-1085)."""
    if cfg.add_global_imgfeat == "first":
        return image_feat[:, 1:]
    if cfg.add_global_imgfeat == "last":
        return image_feat[:, :-1]
    return image_feat


def _jit_step(step_fn, mesh, donate):
    kw = {}
    if donate:
        kw["donate_argnums"] = (0,)
    if mesh is not None:
        kw["in_shardings"] = (None, batch_sharding(mesh))
    return jax.jit(_with_mesh(step_fn, mesh), **kw)


def _with_mesh(fn, mesh):
    """Install the mesh for the trace so Pallas call sites can shard_map
    themselves (see parallel/tp.py)."""
    from .tp import mesh_context

    def wrapped(*args):
        with mesh_context(mesh):
            return fn(*args)

    return wrapped
