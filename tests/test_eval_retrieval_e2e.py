"""End-to-end eval_retrieval CLI on synthetic fixtures."""

import json
import os
import sys
from unittest import mock

import pytest

import fixtures
from volta_tpu import zoo


def test_eval_retrieval_cli(tmp_path):
    tmp = str(tmp_path)
    ids = list(range(20, 28))
    feat_path = fixtures.make_features_lmdb(tmp, ids, feature_size=32)
    ann = fixtures.make_retrieval_annotations(tmp, ids)
    vocab = fixtures.make_vocab(tmp)

    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg_path = os.path.join(tmp, "model.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json_string())

    yml = f"""
TASK8:
  name: RetrievalFlickr30k
  type: VL-logit
  num_labels: 1
  loss: CrossEntropyLoss
  process: retrieval
  dataroot: {tmp}
  features_h5path1: {feat_path}
  features_h5path2: ''
  train_annotations_jsonpath: {ann}
  val_annotations_jsonpath: {ann}
  max_seq_length: 10
  max_region_num: 6
  batch_size: 4
  train_split: train
  val_split: train
  lr: 0.0001
  num_epoch: 1
"""
    yml_path = os.path.join(tmp, "tasks.yml")
    open(yml_path, "w").write(yml)

    import eval_retrieval

    argv = ["eval_retrieval.py",
            "--config_file", cfg_path,
            "--tasks_config_file", yml_path,
            "--task", "8",
            "--vocab_file", vocab,
            "--output_dir", os.path.join(tmp, "results"),
            "--num_workers", "0",
            "--compute_dtype", "float32",
            "--no_pallas"]
    # small gallery chunks for the test
    from volta_tpu.data.datasets import retrieval as rmod
    orig_init = rmod.RetrievalDatasetVal.__init__

    def patched(self, *a, **kw):
        kw["gallery_chunk"] = 4
        return orig_init(self, *a, **kw)

    with mock.patch.object(rmod.RetrievalDatasetVal, "__init__", patched), \
            mock.patch.object(sys, "argv", argv):
        eval_retrieval.main()

    res_dir = os.path.join(tmp, "results")
    run = os.listdir(res_dir)[0]
    metrics = json.load(open(os.path.join(res_dir, run,
                                          "train_metrics.json")))
    ir = metrics["image_retrieval"]
    assert 0 <= ir["r1"] <= 100 and ir["medr"] >= 1
    results = json.load(open(os.path.join(res_dir, run,
                                          "train_result.json")))
    assert len(results) == 16  # 8 images x 2 captions


def test_eval_retrieval_zero_shot(tmp_path):
    """--zero_shot scores with the pretraining ITM head
    (reference: eval_retrieval.py:180-188)."""
    tmp = str(tmp_path)
    ids = list(range(30, 36))
    feat_path = fixtures.make_features_lmdb(tmp, ids, feature_size=32)
    ann = fixtures.make_retrieval_annotations(tmp, ids)
    vocab = fixtures.make_vocab(tmp)
    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg_path = os.path.join(tmp, "model.json")
    open(cfg_path, "w").write(cfg.to_json_string())
    yml_path = os.path.join(tmp, "tasks.yml")
    open(yml_path, "w").write(f"""
TASK8:
  name: RetrievalFlickr30k
  type: VL-logit
  num_labels: 1
  loss: CrossEntropyLoss
  process: retrieval
  dataroot: {tmp}
  features_h5path1: {feat_path}
  features_h5path2: ''
  train_annotations_jsonpath: {ann}
  val_annotations_jsonpath: {ann}
  max_seq_length: 10
  max_region_num: 6
  batch_size: 4
  train_split: train
  val_split: train
  lr: 0.0001
  num_epoch: 1
""")

    import eval_retrieval
    from volta_tpu.data.datasets import retrieval as rmod

    orig_init = rmod.RetrievalDatasetVal.__init__

    def patched(self, *a, **kw):
        kw["gallery_chunk"] = 3
        return orig_init(self, *a, **kw)

    argv = ["eval_retrieval.py", "--config_file", cfg_path,
            "--tasks_config_file", yml_path, "--task", "8",
            "--vocab_file", vocab, "--output_dir",
            os.path.join(tmp, "results"), "--num_workers", "0",
            "--compute_dtype", "float32", "--no_pallas", "--zero_shot"]
    with mock.patch.object(rmod.RetrievalDatasetVal, "__init__", patched), \
            mock.patch.object(sys, "argv", argv):
        eval_retrieval.main()
    run = os.listdir(os.path.join(tmp, "results"))[0]
    metrics = json.load(open(os.path.join(tmp, "results", run,
                                          "train_metrics.json")))
    assert "image_retrieval" in metrics and "text_retrieval" in metrics


def test_eval_retrieval_int8(tmp_path):
    """--quantize int8 scores the gallery with int8 dense matmuls and
    produces metrics in range (see volta_tpu/ops/int8_dense.py)."""
    tmp = str(tmp_path)
    ids = list(range(40, 46))
    feat_path = fixtures.make_features_lmdb(tmp, ids, feature_size=32)
    ann = fixtures.make_retrieval_annotations(tmp, ids)
    vocab = fixtures.make_vocab(tmp)
    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg_path = os.path.join(tmp, "model.json")
    open(cfg_path, "w").write(cfg.to_json_string())
    yml_path = os.path.join(tmp, "tasks.yml")
    open(yml_path, "w").write(f"""
TASK8:
  name: RetrievalFlickr30k
  type: VL-logit
  num_labels: 1
  loss: CrossEntropyLoss
  process: retrieval
  dataroot: {tmp}
  features_h5path1: {feat_path}
  features_h5path2: ''
  train_annotations_jsonpath: {ann}
  val_annotations_jsonpath: {ann}
  max_seq_length: 10
  max_region_num: 6
  batch_size: 4
  train_split: train
  val_split: train
  lr: 0.0001
  num_epoch: 1
""")

    import eval_retrieval
    from volta_tpu.data.datasets import retrieval as rmod

    orig_init = rmod.RetrievalDatasetVal.__init__

    def patched(self, *a, **kw):
        kw["gallery_chunk"] = 3
        return orig_init(self, *a, **kw)

    argv = ["eval_retrieval.py", "--config_file", cfg_path,
            "--tasks_config_file", yml_path, "--task", "8",
            "--vocab_file", vocab, "--output_dir",
            os.path.join(tmp, "results"), "--num_workers", "0",
            "--compute_dtype", "float32", "--no_pallas",
            "--quantize", "int8"]
    with mock.patch.object(rmod.RetrievalDatasetVal, "__init__", patched), \
            mock.patch.object(sys, "argv", argv):
        eval_retrieval.main()
    run = os.listdir(os.path.join(tmp, "results"))[0]
    metrics = json.load(open(os.path.join(tmp, "results", run,
                                          "train_metrics.json")))
    ir = metrics["image_retrieval"]
    assert 0 <= ir["r1"] <= 100 and ir["medr"] >= 1


def test_eval_retrieval_zero_shot_int8(tmp_path):
    """--zero_shot --quantize int8: the pretraining model (tied MLM
    decoder, ITM head) survives the dense-quantization transform."""
    tmp = str(tmp_path)
    ids = list(range(50, 56))
    feat_path = fixtures.make_features_lmdb(tmp, ids, feature_size=32)
    ann = fixtures.make_retrieval_annotations(tmp, ids)
    vocab = fixtures.make_vocab(tmp)
    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg_path = os.path.join(tmp, "model.json")
    open(cfg_path, "w").write(cfg.to_json_string())
    yml_path = os.path.join(tmp, "tasks.yml")
    open(yml_path, "w").write(f"""
TASK8:
  name: RetrievalFlickr30k
  type: VL-logit
  num_labels: 1
  loss: CrossEntropyLoss
  process: retrieval
  dataroot: {tmp}
  features_h5path1: {feat_path}
  features_h5path2: ''
  train_annotations_jsonpath: {ann}
  val_annotations_jsonpath: {ann}
  max_seq_length: 10
  max_region_num: 6
  batch_size: 4
  train_split: train
  val_split: train
  lr: 0.0001
  num_epoch: 1
""")

    import eval_retrieval
    from volta_tpu.data.datasets import retrieval as rmod

    orig_init = rmod.RetrievalDatasetVal.__init__

    def patched(self, *a, **kw):
        kw["gallery_chunk"] = 3
        return orig_init(self, *a, **kw)

    argv = ["eval_retrieval.py", "--config_file", cfg_path,
            "--tasks_config_file", yml_path, "--task", "8",
            "--vocab_file", vocab, "--output_dir",
            os.path.join(tmp, "results"), "--num_workers", "0",
            "--compute_dtype", "float32", "--no_pallas",
            "--zero_shot", "--quantize", "int8"]
    with mock.patch.object(rmod.RetrievalDatasetVal, "__init__", patched), \
            mock.patch.object(sys, "argv", argv):
        eval_retrieval.main()
    run = os.listdir(os.path.join(tmp, "results"))[0]
    metrics = json.load(open(os.path.join(tmp, "results", run,
                                          "train_metrics.json")))
    assert "image_retrieval" in metrics and "text_retrieval" in metrics
