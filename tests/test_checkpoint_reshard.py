"""Checkpoint topology portability.

A real pod migration changes the mesh between save and restore. These
tests prove the Orbax train-state checkpoint moves across layouts —
data=8 -> data=4 x model=2 and the reverse — with exact parameter/moment
equality and a working next step, and that a reference ``.tar`` resume
lands onto a sharded mesh (reference behavior being generalized:
volta/train_utils.py:319-340, which only ever restores onto the same
single-process topology).
"""

import numpy as np
import pytest

import jax

from __graft_entry__ import _flagship, _task_cfg, _vqa_batch
from volta_tpu.checkpoint import restore_train_state, save_train_state
from volta_tpu.models import VoltaForVLTasks
from volta_tpu.optimization import build_optimizer, warmup_linear_schedule
from volta_tpu.parallel import (create_train_state, make_mesh,
                                make_task_train_step, shard_batch)
from volta_tpu.parallel.mesh import state_shardings


def _setup():
    cfg = _flagship(small=True)
    cfg.compute_dtype = "float32"
    task_cfg = _task_cfg(num_labels=8)
    model = VoltaForVLTasks(cfg, task_cfg, ("TASK1",))
    batch = _vqa_batch(cfg, 8, 8, 5)
    batch["target"] = batch["target"][:, :8]
    params = jax.jit(lambda r: model.init(
        r, batch["question"], batch["features"], batch["spatials"], "TASK1",
        batch["segment_ids"], batch["input_mask"], batch["image_mask"]))(
        jax.random.PRNGKey(0))["params"]
    return cfg, task_cfg, model, batch, jax.device_get(params)


def _make_state(model, task_cfg, params, batch, n_data, n_model, steps=1):
    mesh = make_mesh(n_data=n_data, n_model=n_model,
                     devices=jax.devices()[: n_data * n_model])
    tx = build_optimizer("adamw", warmup_linear_schedule(1e-3, 2, 100),
                         params, clip_norm=1.0)
    state = create_train_state(jax.random.PRNGKey(1), params, tx)
    state = jax.device_put(state, state_shardings(mesh, state))
    step = make_task_train_step(model, tx, task_cfg, "TASK1", mesh=mesh)
    metrics = None
    for _ in range(steps):
        state, metrics = step(state, shard_batch(mesh, batch))
    return mesh, state, step, metrics


def _abstract_target(host_state, mesh):
    """ShapeDtypeStruct pytree carrying the target mesh's shardings —
    restore allocates directly into the new layout."""
    shardings = state_shardings(mesh, host_state)
    return jax.tree.map(
        lambda leaf, s: jax.ShapeDtypeStruct(
            np.shape(leaf), np.asarray(leaf).dtype, sharding=s)
        if hasattr(leaf, "shape") or np.ndim(leaf) else leaf,
        host_state, shardings)


def _assert_tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(jax.device_get(a))
    fb = dict(jax.tree_util.tree_leaves_with_path(jax.device_get(b)))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(fb[path]),
                                      err_msg=str(path))


def _spec_names(x):
    return {n for axes in x.sharding.spec for n in
            (axes if isinstance(axes, tuple) else (axes,)) if n}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 CPU devices")
@pytest.mark.slow
def test_orbax_reshard_roundtrip(tmp_path):
    """data=8 save -> data=4 x model=2 restore -> save -> data=8 restore."""
    cfg, task_cfg, model, batch, params = _setup()
    _, state_a, _, m_a = _make_state(model, task_cfg, params, batch, 8, 1)
    save_train_state(str(tmp_path / "a"), 1, state_a)
    host_a = jax.device_get(state_a)

    mesh_b = make_mesh(n_data=4, n_model=2)
    target_b = _abstract_target(host_a, mesh_b)
    state_b, step_no = restore_train_state(str(tmp_path / "a"), target_b)
    assert step_no == 1
    _assert_tree_equal(state_b.params, host_a.params)
    _assert_tree_equal(state_b.opt_state, host_a.opt_state)

    # the big tables actually land tensor-sharded on the new mesh
    emb = state_b.params["bert"]["embeddings"]["word_embeddings"][
        "embedding"]
    assert "model" in _spec_names(emb), emb.sharding

    # reverse-migration save FIRST: the train step donates its input
    # state's buffers, so state_b is consumed by step_b below
    save_train_state(str(tmp_path / "b"), 2, state_b)

    # and the restored state trains: one further step, finite loss
    tx = build_optimizer("adamw", warmup_linear_schedule(1e-3, 2, 100),
                         params, clip_norm=1.0)
    step_b = make_task_train_step(model, tx, task_cfg, "TASK1", mesh=mesh_b)
    state_b2, metrics = step_b(state_b, shard_batch(mesh_b, batch))
    assert np.isfinite(float(metrics["loss"]))
    mesh_c = make_mesh(n_data=8, n_model=1)
    target_c = _abstract_target(host_a, mesh_c)
    state_c, _ = restore_train_state(str(tmp_path / "b"), target_c)
    _assert_tree_equal(state_c.params, host_a.params)
    emb_c = state_c.params["bert"]["embeddings"]["word_embeddings"][
        "embedding"]
    assert not _spec_names(emb_c)  # fully replicated again


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 CPU devices")
@pytest.mark.slow
def test_tar_resume_onto_sharded_mesh(tmp_path):
    """--resume_file pytorch_ckpt_latest.tar onto a data=2 x model=2 mesh:
    weights + moments land, the next sharded step runs."""
    import torch

    from volta_tpu.checkpoint import (_alias_key_set, export_torch_state_dict,
                                      resume_from_torch_tar)

    cfg, task_cfg, model, batch, params = _setup()
    mesh, state, step, _ = _make_state(model, task_cfg, params, batch, 2, 2,
                                       steps=1)

    # reference-format tar built from our exported weights + synthetic
    # moments (same shape as tests/test_resume_from_torch.py's fixture)
    msd, _ = export_torch_state_dict(cfg, jax.device_get(state.params))
    rng = np.random.RandomState(5)
    named = [k for k in msd if k not in _alias_key_set(cfg, msd)]
    opt_state, groups = {}, []
    for i, n in enumerate(named):
        opt_state[i] = {
            "step": 9,
            "exp_avg": torch.from_numpy(
                rng.randn(*msd[n].shape).astype(np.float32)),
            "exp_avg_sq": torch.from_numpy(
                np.abs(rng.randn(*msd[n].shape)).astype(np.float32))}
        groups.append({"lr": 1e-3, "weight_decay": 0.0, "params": [i]})
    tar = str(tmp_path / "pytorch_ckpt_latest.tar")
    torch.save({"model_state_dict":
                {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in msd.items()},
                "optimizer_state_dict": {"state": opt_state,
                                         "param_groups": groups},
                "global_step": 9, "epoch_id": 1}, tar)

    resumed, info = resume_from_torch_tar(cfg, state, tar)
    assert info["global_step"] == 9
    # re-place on the sharded mesh (what train_task.py does implicitly when
    # the jitted step consumes the host leaves) and take a step
    resumed = jax.device_put(resumed, state_shardings(mesh, resumed))
    emb = resumed.params["bert"]["embeddings"]["word_embeddings"][
        "embedding"]
    assert "model" in _spec_names(emb)
    state2, metrics = step(resumed, shard_batch(mesh, batch))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 10
