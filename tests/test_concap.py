import os
import sys
from unittest import mock

import numpy as np
import pytest

import fixtures
from volta_tpu.data.datasets.concap import ConceptCapDataset, \
    make_concap_loader
from volta_tpu.data.tokenization import BertTokenizer


@pytest.fixture(scope="module")
def cc(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("cc"))
    feats_dir, ann_dir = fixtures.make_concap_lmdb(tmp, n=16,
                                                   feature_size=32)
    fixtures.make_concap_lmdb(tmp, n=8, feature_size=32, split="valid")
    vocab = fixtures.make_vocab(tmp)
    return dict(tmp=tmp, feats=feats_dir, ann=ann_dir, vocab=vocab)


def test_concap_dataset_masking(cc):
    tok = BertTokenizer(cc["vocab"])
    ds = ConceptCapDataset(
        os.path.join(cc["feats"], "training_feat_all.lmdb"),
        os.path.join(cc["ann"], "caption_train.json"),
        tok, seq_len=14, region_len=5, num_locs=5,
        add_global_imgfeat="first", seed=0)
    assert len(ds) == 16
    s = ds[0]
    assert s["input_ids"].shape == (14,)
    assert s["image_feat"].shape == (6, 32)  # +global
    assert s["image_loc"].shape == (6, 5)
    assert s["image_label"].shape == (5,)  # no global row
    assert s["image_cls"].shape == (5, 1601)
    assert s["input_ids"][0] == tok.cls_id
    # determinism per (seed, epoch, index)
    s2 = ds[0]
    np.testing.assert_array_equal(s["input_ids"], s2["input_ids"])
    ds.set_epoch(1)
    s3 = ds[0]
    assert not np.array_equal(s["lm_label_ids"], s3["lm_label_ids"]) or \
        not np.array_equal(s["image_label"], s3["image_label"]) or \
        int(s["is_match"]) != int(s3["is_match"])

    # masking statistics over the dataset: some MLM and MRM positions
    ds.set_epoch(0)
    mlm, mrm, itm = 0, 0, 0
    for i in range(len(ds)):
        x = ds[i]
        mlm += int((x["lm_label_ids"] >= 0).sum())
        mrm += int((x["image_label"] == 1).sum())
        itm += int(x["is_match"])
    assert mlm > 0 and mrm > 0
    assert 0 < itm < 16


def test_train_concap_cli(cc):
    import train_concap
    from volta_tpu import zoo

    tmp = cc["tmp"]
    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg_path = os.path.join(tmp, "model.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json_string())

    argv = ["train_concap.py",
            "--config_file", cfg_path,
            "--annotations_path", cc["ann"],
            "--features_path", cc["feats"],
            "--vocab_file", cc["vocab"],
            "--output_dir", os.path.join(tmp, "save"),
            "--logdir", os.path.join(tmp, "logs"),
            "--train_batch_size", "8",
            "--num_train_epochs", "1",
            "--max_seq_length", "14",
            "--max_region_num", "5",
            "--num_workers", "0",
            "--compute_dtype", "float32",
            "--no_pallas"]
    with mock.patch.object(sys, "argv", argv):
        train_concap.main()
    run = os.listdir(os.path.join(tmp, "save"))[0]
    assert os.path.isdir(os.path.join(tmp, "save", run, "ckpt"))
