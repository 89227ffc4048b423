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


def test_trunk_lr_scale_cli(cc):
    """--trunk_lr_scale 0.1 applies the reference's INTENDED pretrained-trunk
    rule (train_concap.py:213-224 — dead code there as shipped, see
    optimization.scale_updates_by): params imported from the BERT checkpoint
    move ~10x less, fresh-init params move the same."""
    import torch
    import transformers

    import train_concap
    from volta_tpu import zoo
    from volta_tpu.checkpoint import _restore_raw

    tmp = cc["tmp"]
    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg_path = os.path.join(tmp, "model_lrscale.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json_string())

    hf_cfg = transformers.BertConfig(
        vocab_size=23, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2)
    torch.manual_seed(7)
    hf = transformers.BertModel(hf_cfg)
    bin_path = os.path.join(tmp, "tiny_hf_bert.bin")
    torch.save(hf.state_dict(), bin_path)
    word0 = hf.state_dict()["embeddings.word_embeddings.weight"].numpy()

    def run(scale, name):
        argv = ["train_concap.py",
                "--config_file", cfg_path,
                "--annotations_path", cc["ann"],
                "--features_path", cc["feats"],
                "--vocab_file", cc["vocab"],
                "--from_pretrained", bin_path,
                "--trunk_lr_scale", str(scale),
                "--save_name", name,
                "--output_dir", os.path.join(tmp, "save_lrscale"),
                "--logdir", os.path.join(tmp, "logs_lrscale"),
                "--train_batch_size", "8",
                "--num_train_epochs", "1",
                "--max_seq_length", "14",
                "--max_region_num", "5",
                "--num_workers", "0",
                "--seed", "11",
                "--compute_dtype", "float32",
                "--no_pallas"]
        with mock.patch.object(sys, "argv", argv):
            train_concap.main()
        run_dir = os.path.join(tmp, "save_lrscale",
                               f"model_lrscale.json-{name}")
        restored = _restore_raw(os.path.join(run_dir, "ckpt"))
        while isinstance(restored, dict) and "params" not in restored:
            restored = restored[next(iter(restored))]
        return restored["params"]

    p_full = run(1.0, "full")
    p_slow = run(0.1, "slow")

    def delta(params, path, ref):
        leaf = params
        for k in path:
            leaf = leaf[k]
        return float(np.abs(np.asarray(leaf) - ref).mean())

    word_path = ("bert", "embeddings", "word_embeddings", "embedding")
    d_full = delta(p_full, word_path, word0)
    d_slow = delta(p_slow, word_path, word0)
    assert d_slow > 0  # it did train
    assert d_slow < 0.3 * d_full, (d_slow, d_full)

    # a fresh-init (non-imported) param is NOT slowed: identical step-1
    # updates, near-identical after 2 steps
    def first_leaf(t):
        while isinstance(t, dict):
            t = t[sorted(t)[0]]
        return np.asarray(t)
    v_full = first_leaf(p_full["bert"]["embeddings"]["feat_dense"])
    v_slow = first_leaf(p_slow["bert"]["embeddings"]["feat_dense"])
    denom = np.abs(v_full).mean() + 1e-12
    assert np.abs(v_full - v_slow).mean() / denom < 0.2
