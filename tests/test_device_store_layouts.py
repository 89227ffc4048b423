"""Device-resident feature store for the expand/nlvr layouts.

Round-2 covered only the ``normal``-process single-reader store; VCR
(det+GT merged regions, option tiling) and NLVR2 (image pairs) shipped
dense features. These tests assert the store-fed train step reproduces the
dense-batch step exactly for both layouts (reference layouts:
volta/task_utils.py:185-232, vcr_dataset.py:361-395,
nlvr2_dataset.py:192-206).
"""

import json

import numpy as np
import pytest

import jax

import fixtures
from __graft_entry__ import _flagship
from volta_tpu.data import ImageFeaturesReader
from volta_tpu.data.datasets import DatasetMapTrain, VCRDataset
from volta_tpu.data.tokenization import BertTokenizer
from volta_tpu.models import VoltaForVLTasks
from volta_tpu.optimization import build_optimizer, warmup_linear_schedule
from volta_tpu.parallel import create_train_state, make_task_train_step

FS = 32


def _collate(ds, idx):
    samples = [ds[i] for i in idx]
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def _run_pair(cfg, task_cfg, dense, small, store):
    from volta_tpu.task_utils import process_batch

    model = VoltaForVLTasks(cfg, task_cfg, ("TASK1",))
    inputs, _ = process_batch(task_cfg["TASK1"], dense)
    params = jax.device_get(model.init(
        jax.random.PRNGKey(0), inputs["input_ids"], inputs["image_feat"],
        inputs["image_loc"], "TASK1", inputs["token_type_ids"],
        inputs["attention_mask"], inputs["image_attention_mask"])["params"])
    tx = build_optimizer("adamw", warmup_linear_schedule(1e-3, 2, 10),
                         params, clip_norm=1.0)

    def run(step, batch):
        state = create_train_state(jax.random.PRNGKey(1), params, tx)
        state, m = step(state, batch)
        return jax.device_get(m), jax.device_get(state.params)

    m_dense, p_dense = run(
        make_task_train_step(model, tx, task_cfg, "TASK1"), dense)
    m_store, p_store = run(
        make_task_train_step(model, tx, task_cfg, "TASK1", store=store),
        small)
    assert m_store["loss"] == pytest.approx(m_dense["loss"], abs=1e-6)
    assert m_store["score"] == pytest.approx(m_dense["score"], abs=1e-6)
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(p_dense),
            jax.tree_util.tree_leaves_with_path(p_store)):
        np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-7,
                                   err_msg=str(pa))


def _small_cfg():
    cfg = _flagship(small=True)
    cfg.compute_dtype = "float32"
    cfg.v_feature_size = FS
    return cfg


@pytest.mark.slow
def test_vcr_store_step_matches_dense(tmp_path):
    tmp = tmp_path
    meta_dir = tmp / "vcr1images"
    meta_dir.mkdir()
    ann = tmp / "vcr.jsonl"
    with open(ann, "w") as f:
        for i in range(4):
            json.dump({"names": ["person", "dog"]},
                      open(meta_dir / f"m{i}.json", "w"))
            f.write(json.dumps({
                "question": ["what", "is", [0], "doing", "?"],
                "answer_choices": [["play", "##s"], ["run"],
                                   ["the", "ball"], [[1], "run", "##s"]],
                "answer_label": i % 4,
                "rationale_choices": [["a"], ["b"], ["c"], ["d"]],
                "rationale_label": (i + 1) % 4,
                "img_id": f"train-{i}", "img_fn": f"img{i}.jpg",
                "metadata_fn": f"m{i}.json", "annot_id": f"train-{i}",
            }) + "\n")
    ids = [f"m{i}.jpg" for i in range(4)]
    det_path = fixtures.make_features_lmdb(str(tmp), ids, num_boxes=6,
                                           feature_size=FS, name="det.lmdb")
    gt_path = fixtures.make_features_lmdb(str(tmp), ids, num_boxes=4,
                                          feature_size=FS, name="gt.lmdb")
    det = ImageFeaturesReader(det_path, num_locs=5, feature_size=FS)
    gt = ImageFeaturesReader(gt_path, num_locs=5, feature_size=FS)
    tok = BertTokenizer(fixtures.make_vocab(str(tmp)))
    ds = VCRDataset("VCR_Q-A", str(tmp), str(ann), "train", det, gt, tok,
                    max_seq_length=12, max_region_num=8)

    idx = np.arange(4)
    dense = _collate(ds, idx)
    ds.enable_device_store(cache=False)
    small = ds.get_batch(idx)
    assert "features" not in small and "store_rows" in small
    np.testing.assert_array_equal(small["target"], dense["target"])

    cfg = _small_cfg()
    task_cfg = {"TASK1": {"type": "VL-logit", "process": "expand",
                          "loss": "CrossEntropyLoss", "num_labels": 1}}
    _run_pair(cfg, task_cfg, dense, small, ds.device_store_arrays())


@pytest.mark.slow
def test_nlvr2_store_step_matches_dense(tmp_path):
    tmp = str(tmp_path)
    _, ids = fixtures.make_nlvr2_annotations(tmp, n=6)
    feat_path = fixtures.make_features_lmdb(tmp, ids, num_boxes=4,
                                            feature_size=FS)
    reader = ImageFeaturesReader(feat_path, num_locs=5, feature_size=FS)
    tok = BertTokenizer(fixtures.make_vocab(tmp))
    ds = DatasetMapTrain["NLVR2"](
        task="NLVR2", dataroot=tmp, annotations_jsonpath="", split="train",
        image_features_reader=reader, gt_image_features_reader=None,
        tokenizer=tok, bert_model="bert-base-uncased", padding_index=0,
        max_seq_length=10, max_region_num=4, num_locs=5,
        add_global_imgfeat=None)

    idx = np.arange(6)
    dense = _collate(ds, idx)
    ds.enable_device_store(cache=False)
    small = ds.get_batch(idx)
    assert small["store_rows"].shape == (6, 2)
    np.testing.assert_array_equal(small["target"], dense["target"])

    cfg = _small_cfg()
    cfg.add_global_imgfeat = None
    task_cfg = {"TASK1": {"type": "VL-binary-classifier", "process": "nlvr",
                          "loss": "BCEWithLogitLoss", "num_labels": 2}}
    _run_pair(cfg, task_cfg, dense, small, ds.device_store_arrays())


def test_store_wire_dtypes_narrow(tmp_path):
    """Device-store batches ship narrow wire dtypes (int16 tokens, int8
    masks/segments) that _widen_wire restores to int32 on device — the
    equivalence tests above prove numerics; this pins the wire format so
    a regression back to int32/int64 (4x the host->device bytes on this
    25 MB/s link) fails loudly."""
    tmp = str(tmp_path)
    ids = [10, 11, 12]
    feat_path = fixtures.make_features_lmdb(tmp, ids, feature_size=FS)
    fixtures.make_vqa_annotations(tmp, ids, n_questions=8, num_labels=9)
    tok = BertTokenizer(fixtures.make_vocab(tmp))
    reader = ImageFeaturesReader(feat_path, num_locs=5, feature_size=FS)
    ds = DatasetMapTrain["VQA"](
        task="VQA", dataroot=tmp, annotations_jsonpath="", split="train",
        image_features_reader=reader, gt_image_features_reader=None,
        tokenizer=tok, bert_model="bert-base-uncased", padding_index=0,
        max_seq_length=12, max_region_num=6, num_locs=5,
        add_global_imgfeat=None)
    ds.enable_device_store(cache=False)
    b = ds.get_batch(np.arange(8))
    assert b["question"].dtype == np.int16
    assert b["input_mask"].dtype == np.int8
    assert b["segment_ids"].dtype == np.int8
    assert b["target_labels"].dtype == np.int16
    # and the device side widens them before any compute
    from volta_tpu.parallel.train_step import _widen_wire

    w = _widen_wire({k: jax.numpy.asarray(v) for k, v in b.items()
                     if k != "question_id"})
    assert w["question"].dtype == jax.numpy.int32
    assert w["input_mask"].dtype == jax.numpy.int32
    np.testing.assert_array_equal(np.asarray(w["question"]), b["question"])

    # shard_batch keeps question_id off the device wire entirely
    from volta_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh()
    sb = shard_batch(mesh, b)
    assert "question_id" not in sb and "question" in sb
