"""End-to-end training-step tests on the 8-device CPU mesh.

Mirrors what apex's distributed tests verify (gradient all-reduce
correctness) but on a virtual mesh: the jitted step's psum must give the
same update as single-device training, and losses must go down.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volta_tpu import zoo
from volta_tpu.models import VoltaForVLPreTraining, VoltaForVLTasks
from volta_tpu.optimization import build_optimizer, warmup_linear_schedule
from volta_tpu.parallel import (create_train_state, make_mesh,
                                make_pretrain_step, make_task_train_step,
                                replicated, shard_batch)

from test_model_shapes import tiny_zoo

B, L, K = 16, 12, 8


def make_task_batch(cfg, rng, num_labels=7):
    ids = rng.randint(1, cfg.vocab_size, (B, L)).astype(np.int32)
    target = np.zeros((B, num_labels), np.float32)
    target[np.arange(B), rng.randint(0, num_labels, B)] = 1.0
    return {
        "features": rng.randn(B, K, cfg.v_feature_size).astype(np.float32),
        "spatials": rng.rand(B, K, cfg.num_locs).astype(np.float32),
        "image_mask": np.ones((B, K), np.int32),
        "question": ids,
        "target": target,
        "input_mask": (ids != 0).astype(np.int32),
        "segment_ids": np.zeros((B, L), np.int32),
        "question_id": np.arange(B, dtype=np.int32),
    }


def test_finetune_loss_decreases_on_mesh():
    cfg = tiny_zoo("ctrl_uniter_base")
    task_cfg = {"TASK1": {"type": "VL-classifier", "num_labels": 7,
                          "process": "normal", "loss": "BCEWithLogitLoss"}}
    model = VoltaForVLTasks(cfg, task_cfg, ("TASK1",))
    rng = np.random.RandomState(0)
    batch = make_task_batch(cfg, rng)

    params = jax.jit(lambda r: model.init(
        r, batch["question"], batch["features"], batch["spatials"], "TASK1",
        batch["segment_ids"], batch["input_mask"], batch["image_mask"]))(
        jax.random.PRNGKey(0))["params"]

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    sched = warmup_linear_schedule(5e-4, 5, 100)
    tx = build_optimizer("adamw", sched, params, clip_norm=1.0)
    state = create_train_state(jax.random.PRNGKey(1), params, tx)
    state = jax.device_put(state, replicated(mesh))
    step = make_task_train_step(model, tx, task_cfg, "TASK1", mesh=mesh)

    sharded = shard_batch(mesh, batch)
    losses = []
    for _ in range(8):
        state, metrics = step(state, sharded)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_mesh_matches_single_device():
    """Same batch, same init: the 8-way sharded step must produce the same
    params as the unsharded step (the psum is exact)."""
    cfg = tiny_zoo("ctrl_visualbert_base")
    task_cfg = {"TASK1": {"type": "VL-classifier", "num_labels": 7,
                          "process": "normal", "loss": "BCEWithLogitLoss"}}
    model = VoltaForVLTasks(cfg, task_cfg, ("TASK1",))
    rng = np.random.RandomState(1)
    batch = make_task_batch(cfg, rng)
    params = jax.jit(lambda r: model.init(
        r, batch["question"], batch["features"], batch["spatials"], "TASK1",
        batch["segment_ids"], batch["input_mask"], batch["image_mask"]))(
        jax.random.PRNGKey(0))["params"]
    tx = build_optimizer("adamw", 1e-3, params)

    def run(mesh):
        state = create_train_state(jax.random.PRNGKey(1), params, tx)
        if mesh is not None:
            state = jax.device_put(state, replicated(mesh))
            b = shard_batch(mesh, batch)
        else:
            b = batch
        step = make_task_train_step(model, tx, task_cfg, "TASK1", mesh=mesh,
                                    donate=False)
        state, m = step(state, b)
        return state, m

    s1, m1 = run(None)
    s8, m8 = run(make_mesh())
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b_ in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-6)


def test_pretrain_step_runs():
    cfg = tiny_zoo("ctrl_uniter_base")
    model = VoltaForVLPreTraining(cfg)
    rng = np.random.RandomState(2)
    ids = rng.randint(1, cfg.vocab_size, (B, L)).astype(np.int32)
    lm_labels = np.full((B, L), -1, np.int32)
    lm_labels[:, 2] = 5
    batch = {
        "input_ids": ids,
        "input_mask": np.ones((B, L), np.int32),
        "segment_ids": np.zeros((B, L), np.int32),
        "lm_label_ids": lm_labels,
        "is_match": rng.randint(0, 2, (B,)).astype(np.int32),
        "image_feat": rng.randn(B, K, cfg.v_feature_size).astype(np.float32),
        "image_loc": rng.rand(B, K, cfg.num_locs).astype(np.float32),
        "image_cls": np.abs(rng.rand(B, K - 1, 1601).astype(np.float32)),
        "image_label": rng.randint(-1, 2, (B, K - 1)).astype(np.int32),
        "image_mask": np.ones((B, K), np.int32),
    }
    batch["image_cls"] /= batch["image_cls"].sum(-1, keepdims=True)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), ids, batch["image_feat"], batch["image_loc"],
        batch["segment_ids"], batch["input_mask"], batch["image_mask"]
    )["params"]
    tx = build_optimizer("adamw", 1e-4, params, grad_accum_steps=2)
    state = create_train_state(jax.random.PRNGKey(3), params, tx)
    step = make_pretrain_step(model, tx, cfg, objective=0)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert float(metrics["masked_t"]) > 0
    assert float(metrics["itm"]) > 0


def test_radam_runs():
    from volta_tpu.optimization import radam
    import optax
    params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
    tx = radam(1e-2, weight_decay=0.01,
               mask={"w": True, "bias": False})
    state = tx.init(params)
    g = {"w": jnp.ones((4, 4)), "bias": jnp.ones((4,))}
    for _ in range(6):
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
    assert np.isfinite(np.asarray(params["w"])).all()
    assert float(params["w"][0, 0]) < 1.0
