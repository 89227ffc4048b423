"""Packed (vectorised) batch assembly must match the per-sample path.

The packed mode (volta_tpu/data/packed.py + enable_packed) exists so one
slow host core can feed ~2.8k samples/s to the device; correctness bar is
bitwise equality with __getitem__ + collate for the deterministic datasets
(VQA/GQA), and field-semantics equality for the stochastic CC pipeline
(checked in test_concap_packed below with masking disabled / distribution
asserts).
"""

import numpy as np
import pytest

import fixtures
from volta_tpu.data.datasets import DatasetMapTrain
from volta_tpu.data.features_reader import ImageFeaturesReader
from volta_tpu.data.loader import DataLoader, collate
from volta_tpu.data.tokenization import BertTokenizer


@pytest.fixture(scope="module")
def vqa_ds(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("packed"))
    ids = [10, 11, 12, 13]
    feat = fixtures.make_features_lmdb(tmp, ids, feature_size=32)
    fixtures.make_vqa_annotations(tmp, ids, n_questions=20, num_labels=9)
    tok = BertTokenizer(fixtures.make_vocab(tmp))
    reader = ImageFeaturesReader(feat, num_locs=5, add_global_imgfeat="last",
                                 feature_size=32)
    return DatasetMapTrain["VQA"](
        task="VQA", dataroot=tmp, annotations_jsonpath="", split="train",
        image_features_reader=reader, gt_image_features_reader=None,
        tokenizer=tok, bert_model="bert-base-uncased", padding_index=0,
        max_seq_length=12, max_region_num=6, num_locs=5,
        add_global_imgfeat="last")


def test_packed_matches_getitem(vqa_ds):
    idx = np.array([3, 0, 7, 12, 19])
    want = collate([vqa_ds[int(i)] for i in idx])
    vqa_ds.enable_packed(cache=False)
    got = vqa_ds.get_batch(idx)
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_array_equal(np.asarray(got[key]),
                                      np.asarray(want[key]), err_msg=key)


def test_loader_uses_packed_path(vqa_ds):
    vqa_ds.enable_packed(cache=False)
    loader = DataLoader(vqa_ds, 4, shuffle=True, seed=1, drop_last=True,
                        num_workers=2)
    batches = list(loader)
    assert len(batches) == 5
    assert batches[0]["features"].shape == (4, 7, 32)  # 6 + global
    # same epoch is reproducible
    again = list(loader)
    np.testing.assert_array_equal(batches[0]["question_id"],
                                  again[0]["question_id"])


def _make_cc(tmp, n=24, objective=0, visualization=False):
    from volta_tpu.data.datasets.concap import ConceptCapDataset
    import os

    feats_dir, ann_dir = fixtures.make_concap_lmdb(tmp, n=n, num_boxes=5,
                                                   feature_size=32)
    tok = BertTokenizer(fixtures.make_vocab(tmp))
    return ConceptCapDataset(
        os.path.join(feats_dir, "training_feat_all.lmdb"),
        os.path.join(ann_dir, "caption_train.json"), tok,
        seq_len=12, region_len=6, objective=objective,
        visualization=visualization, num_locs=5,
        add_global_imgfeat="last")


def test_concap_packed_matches_getitem_deterministic(tmp_path):
    """With masking/ITM disabled the packed CC batch must equal the
    per-sample path exactly (image_attrs is intentionally absent — nothing
    consumes it)."""
    ds = _make_cc(str(tmp_path), objective=2, visualization=True)
    ds.enable_packed(cache=False)
    idx = np.array([5, 0, 17, 9])
    got = ds.get_batch(idx)
    want = collate([ds[int(i)] for i in idx])
    for key in got:
        np.testing.assert_allclose(
            np.asarray(got[key], np.float32),
            np.asarray(want[key], np.float32), rtol=1e-6, atol=1e-6,
            err_msg=key)
    assert set(want) - set(got) == {"image_attrs"}


def test_concap_packed_masking_statistics(tmp_path):
    """Masking marginals match the reference probabilities: 15% MLM, 15%
    MRM (90% zeroed), 50% ITM negatives."""
    ds = _make_cc(str(tmp_path), n=64)
    ds.enable_packed(cache=False)
    rng = np.random.RandomState(0)
    mlm_frac, mrm_frac, itm_frac, zero_frac = [], [], [], []
    for e in range(30):
        ds.set_epoch(e)
        idx = rng.permutation(len(ds))[:32]
        b = ds.get_batch(idx)
        valid_t = b["input_mask"].astype(bool)
        # CLS/SEP are never masked
        inner = b["lm_label_ids"] != -1
        assert not inner[:, 0].any()
        mlm_frac.append(inner.sum() / max(valid_t.sum() - 2 * len(idx), 1))
        valid_r = b["image_mask"][:, :-1].astype(bool)  # drop global
        masked_r = b["image_label"] == 1
        assert not (masked_r & ~valid_r).any()
        mrm_frac.append(masked_r.sum() / valid_r.sum())
        zeroed = (np.asarray(b["image_feat"][:, :-1], np.float32) == 0)\
            .all(-1) & masked_r
        zero_frac.append(zeroed.sum() / max(masked_r.sum(), 1))
        itm_frac.append(b["is_match"].mean())
    assert abs(np.mean(mlm_frac) - 0.15) < 0.03
    assert abs(np.mean(mrm_frac) - 0.15) < 0.03
    assert abs(np.mean(itm_frac) - 0.5) < 0.08
    assert abs(np.mean(zero_frac) - 0.9) < 0.06


def test_concap_packed_cache_roundtrip(tmp_path):
    ds = _make_cc(str(tmp_path))
    ds.enable_packed(cache=True)
    first = {k: np.asarray(v).copy() for k, v in ds._p.items()}
    ds2 = _make_cc(str(tmp_path))
    ds2.enable_packed(cache=True)  # loads from disk
    for k in first:
        np.testing.assert_array_equal(first[k], np.asarray(ds2._p[k]),
                                      err_msg=k)


@pytest.mark.slow
def test_device_store_step_matches_dense(tmp_path):
    """A train step fed (row indices + sparse targets) against the
    HBM-resident store must produce exactly the same loss/score/params as
    the dense-batch step."""
    import jax
    import os

    from __graft_entry__ import _flagship
    from volta_tpu.models import VoltaForVLTasks
    from volta_tpu.optimization import (build_optimizer,
                                        warmup_linear_schedule)
    from volta_tpu.parallel import create_train_state, make_task_train_step

    tmp = str(tmp_path)
    ids = [20, 21, 22]
    cfg = _flagship(small=True)
    cfg.compute_dtype = "float32"
    feat = fixtures.make_features_lmdb(tmp, ids,
                                       feature_size=cfg.v_feature_size)
    fixtures.make_vqa_annotations(tmp, ids, n_questions=16, num_labels=8)
    tok = BertTokenizer(fixtures.make_vocab(tmp))
    reader = ImageFeaturesReader(feat, num_locs=cfg.num_locs,
                                 add_global_imgfeat=cfg.add_global_imgfeat,
                                 feature_size=cfg.v_feature_size)
    ds = DatasetMapTrain["VQA"](
        task="VQA", dataroot=tmp, annotations_jsonpath="", split="train",
        image_features_reader=reader, gt_image_features_reader=None,
        tokenizer=tok, bert_model="bert-base-uncased", padding_index=0,
        max_seq_length=10, max_region_num=4, num_locs=cfg.num_locs,
        add_global_imgfeat=cfg.add_global_imgfeat)
    ds.enable_packed(cache=False)
    idx = np.arange(8)
    dense = ds.get_batch(idx)
    ds.enable_device_store()
    small = ds.get_batch(idx)
    assert "features" not in small and "store_rows" in small

    task_cfg = {"TASK1": {"type": "VL-classifier", "num_labels": 8,
                          "process": "normal", "loss": "BCEWithLogitLoss"}}
    model = VoltaForVLTasks(cfg, task_cfg, ("TASK1",))
    params = jax.device_get(model.init(
        jax.random.PRNGKey(0), dense["question"], dense["features"],
        dense["spatials"], "TASK1", dense["segment_ids"],
        dense["input_mask"], dense["image_mask"])["params"])
    tx = build_optimizer("adamw", warmup_linear_schedule(1e-3, 2, 10),
                         params, clip_norm=1.0)

    def run(step, batch):
        state = create_train_state(jax.random.PRNGKey(1), params, tx)
        state, m = step(state, batch)
        return jax.device_get(m), jax.device_get(state.params)

    m_dense, p_dense = run(
        make_task_train_step(model, tx, task_cfg, "TASK1"), dense)
    store = ds.device_store_arrays()
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


def test_concap_device_store_matches_packed(tmp_path):
    """CC device-store path (host mask draws + on-device gather/zero/
    co-mask/global-mean) must reproduce the packed host batch exactly."""
    from volta_tpu.parallel.train_step import materialize_cc_store_batch

    ds = _make_cc(str(tmp_path), n=24)
    ds.enable_packed(cache=False)
    ds.set_epoch(3)
    idx = np.array([4, 19, 7, 0])
    want = ds.get_batch(idx)
    ds.enable_device_store()
    small = ds.get_batch(idx)
    assert "image_feat" not in small and "mrm_mask" in small
    store = ds.device_store_arrays()
    got = materialize_cc_store_batch(store, small, ds_cfg(ds))
    for key in want:
        np.testing.assert_allclose(
            np.asarray(got[key], np.float32),
            np.asarray(want[key], np.float32), rtol=1e-6, atol=1e-6,
            err_msg=key)


def test_concap_store_target_pruning(tmp_path):
    """targets= prunes per-objective arrays (NCE needs no cls/obj/attr);
    the materialised batch simply omits the pruned keys."""
    from volta_tpu.parallel.train_step import materialize_cc_store_batch

    ds = _make_cc(str(tmp_path), n=8)
    ds.enable_device_store(cache=False)
    full = ds.device_store_arrays()
    nce = ds.device_store_arrays(targets={"2"})
    assert "cls" in full and "obj_l" in full
    assert "cls" not in nce and "obj_l" not in nce and "attr_c" not in nce
    assert "feat" in nce and "ovl" in nce
    kl = ds.device_store_arrays(targets={"0"})
    assert "cls" in kl and "obj_l" not in kl

    idx = np.array([1, 3])
    small = ds.get_batch(idx)
    got = materialize_cc_store_batch(nce, small, ds_cfg(ds))
    assert "image_cls" not in got and "image_feat" in got
    want = materialize_cc_store_batch(full, small, ds_cfg(ds))
    np.testing.assert_allclose(np.asarray(got["image_feat"], np.float32),
                               np.asarray(want["image_feat"], np.float32))


def ds_cfg(ds):
    """Minimal cfg view for materialize_cc_store_batch."""
    class C:
        add_global_imgfeat = ds.add_global_imgfeat
        num_locs = ds.num_locs
    return C


def test_proc_workers_match_threads(vqa_ds):
    loader_t = DataLoader(vqa_ds, 4, shuffle=True, seed=2, drop_last=True,
                          num_workers=2)
    loader_p = DataLoader(vqa_ds, 4, shuffle=True, seed=2, drop_last=True,
                          num_workers=0, num_procs=2)
    for bt, bp in zip(loader_t, loader_p):
        for key in bt:
            np.testing.assert_array_equal(np.asarray(bt[key]),
                                          np.asarray(bp[key]), err_msg=key)
