"""True multi-process data-parallel simulation (the test the reference
never had — its DDP tests require >= 2 physical GPUs, SURVEY.md §4).

Two separate Python processes form a jax.distributed CPU cluster (one
device each), each feeds a DIFFERENT per-host batch through the real
``shard_batch`` path, and run the same jitted DP train step. The losses
must agree across hosts (psum over the global mesh) and must equal a
single-process run over the concatenated global batch — which proves the
per-host shard assembly (``make_array_from_process_local_data``) feeds
every host's samples into the step exactly once."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)  # 1 device per process
    port = "12741"
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "_mh_worker.py"), str(i), port,
         outs[i]], env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]
    w0, w1 = (json.load(open(o)) for o in outs)
    assert w0["process_count"] == 2 and w0["device_count"] == 2
    # both hosts observe the same global loss and end in the same state
    np.testing.assert_allclose(w0["losses"], w1["losses"], rtol=1e-6)
    np.testing.assert_allclose(w0["fingerprint"], w1["fingerprint"],
                               rtol=1e-6)

    # single-process reference over the concatenated global batch
    from _mh_worker import local_batch

    import jax

    # earlier CLI tests may have switched the process-wide PRNG impl (rbg);
    # the workers use threefry, so pin it for the in-process reference too
    jax.config.update("jax_default_prng_impl", "threefry2x32")

    from volta_tpu import zoo
    from volta_tpu.models import VoltaForVLTasks
    from volta_tpu.optimization import build_optimizer, \
        warmup_linear_schedule
    from volta_tpu.parallel import (create_train_state, make_mesh,
                                    make_task_train_step, shard_batch)

    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg.compute_dtype = "float32"
    cfg.use_pallas = False
    task_cfg = {"TASK1": {"type": "VL-classifier", "num_labels": 9,
                          "loss": "BCEWithLogitLoss"}}
    b, l, r = 4, 10, 7
    b0, b1 = local_batch(0, cfg, b, l, r), local_batch(1, cfg, b, l, r)
    # device order = process order, so global batch = [host0 ; host1]
    batch = {k: np.concatenate([b0[k], b1[k]]) for k in b0}

    model = VoltaForVLTasks(cfg, task_cfg, ("TASK1",))
    params = model.init(jax.random.PRNGKey(0), b0["question"],
                        b0["features"], b0["spatials"], "TASK1",
                        b0["segment_ids"], b0["input_mask"],
                        b0["image_mask"])["params"]
    tx = build_optimizer("adamw", warmup_linear_schedule(1e-3, 10, 100),
                         params, clip_norm=1.0)
    state = create_train_state(jax.random.PRNGKey(1), params, tx)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    step = make_task_train_step(model, tx, task_cfg, "TASK1", mesh=mesh)
    ref_losses = []
    for _ in range(2):
        state, m = step(state, shard_batch(mesh, batch))
        ref_losses.append(float(m["loss"]))
    np.testing.assert_allclose(w0["losses"], ref_losses, rtol=1e-5)


@pytest.mark.slow
def test_two_process_pretraining_with_rank_shards(tmp_path):
    """CC pretraining across 2 processes, each consuming its OWN per-rank
    LMDB shard (training_feat_part_<rank>.lmdb, reference
    concept_cap_dataset.py:194-198), under grad-accum 2 (MultiSteps).
    Global-batch equivalence vs a single process consuming both shards
    concatenated (VERDICT r5 #5)."""
    import fixtures

    data_dir = str(tmp_path / "cc")
    os.makedirs(data_dir)
    fixtures.make_concap_shards(data_dir, n_per_shard=16, shards=2)
    fixtures.make_vocab(data_dir)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)
    port = "12747"
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "_mh_pretrain_worker.py"),
         str(i), port, outs[i], data_dir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for i in range(2)]
    for p in procs:
        try:
            _, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]
    w0, w1 = (json.load(open(o)) for o in outs)
    assert w0["process_count"] == 2
    assert w0["n_local"] == 16  # each worker saw only its own shard
    np.testing.assert_allclose(w0["losses"], w1["losses"], rtol=1e-6)
    np.testing.assert_allclose(w0["fingerprint"], w1["fingerprint"],
                               rtol=1e-6)

    # single-process reference: both shard loaders, batches concatenated
    # pairwise in device(=process) order, same grad-accum step
    import jax

    jax.config.update("jax_default_prng_impl", "threefry2x32")

    from _mh_pretrain_worker import MICRO_STEPS, build_step, make_loader

    from volta_tpu.parallel import make_mesh, shard_batch

    loaders = [iter(make_loader(data_dir, shard_index=s)[1])
               for s in range(2)]
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    b0, b1 = next(loaders[0]), next(loaders[1])
    batch = {k: np.concatenate([b0[k], b1[k]]) for k in b0}
    state, step = build_step(b0, mesh)
    ref_losses = []
    params_before_accum = None
    for i in range(MICRO_STEPS):
        if i == 0:
            params_before_accum = jax.device_get(
                jax.tree_util.tree_leaves(state.params)[0])
        state, m = step(state, shard_batch(mesh, batch))
        ref_losses.append(float(m["loss"]))
        if i == 0:
            # MultiSteps: after the FIRST micro-step params are unchanged
            after = jax.device_get(
                jax.tree_util.tree_leaves(state.params)[0])
            np.testing.assert_array_equal(params_before_accum, after)
        if i + 1 < MICRO_STEPS:
            b0, b1 = next(loaders[0]), next(loaders[1])
            batch = {k: np.concatenate([b0[k], b1[k]]) for k in b0}
    np.testing.assert_allclose(w0["losses"], ref_losses, rtol=1e-5)
