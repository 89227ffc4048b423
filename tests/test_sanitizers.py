"""Sanitizer-style CI checks (SURVEY §5.2 plan): buffer-donation aliasing
correctness and NaN detection, replacing apex's DDP race-condition test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from volta_tpu.models import VoltaForVLTasks
from volta_tpu.optimization import build_optimizer
from volta_tpu.parallel import (create_train_state, make_task_train_step)

from test_model_shapes import tiny_zoo
from test_train_step import make_task_batch

TASK_CFG = {"TASK1": {"type": "VL-classifier", "num_labels": 7,
                      "process": "normal", "loss": "BCEWithLogitLoss"}}


def _setup(donate):
    cfg = tiny_zoo("ctrl_uniter_base")
    model = VoltaForVLTasks(cfg, TASK_CFG, ("TASK1",))
    rng = np.random.RandomState(0)
    b1 = make_task_batch(cfg, rng)
    b2 = make_task_batch(cfg, np.random.RandomState(1))
    params = jax.jit(lambda r: model.init(
        r, b1["question"], b1["features"], b1["spatials"], "TASK1",
        b1["segment_ids"], b1["input_mask"], b1["image_mask"]))(
        jax.random.PRNGKey(0))["params"]
    tx = build_optimizer("adamw", 1e-3, params)
    state = create_train_state(jax.random.PRNGKey(1), params, tx)
    step = make_task_train_step(model, tx, TASK_CFG, "TASK1", donate=donate)
    return state, step, (b1, b2)


def test_donation_matches_undonated():
    """Donated buffers must not corrupt the multi-step trajectory."""
    s_d, step_d, batches = _setup(donate=True)
    s_u, step_u, _ = _setup(donate=False)
    for b in batches:
        s_d, m_d = step_d(s_d, b)
        s_u, m_u = step_u(s_u, b)
    np.testing.assert_allclose(float(m_d["loss"]), float(m_u["loss"]),
                               rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s_d.params),
                     jax.tree_util.tree_leaves(s_u.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6)


def test_nan_inputs_detected():
    """jax_debug_nans catches a poisoned batch inside the jitted step."""
    state, step, (b1, _) = _setup(donate=False)
    bad = dict(b1)
    bad["features"] = b1["features"].copy()
    bad["features"][0, 0, 0] = np.nan
    with jax.debug_nans(True):
        with pytest.raises((FloatingPointError, ZeroDivisionError)):
            _, m = step(state, bad)
            float(m["loss"])
