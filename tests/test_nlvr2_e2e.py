"""NLVR2 end-to-end: dual-stream model + nlvr process through the CLI."""

import json
import os
import sys
from unittest import mock

import fixtures
from volta_tpu import zoo


def test_nlvr2_train_cli(tmp_path):
    tmp = str(tmp_path)
    ann_path, image_ids = fixtures.make_nlvr2_annotations(tmp, n=8)
    feat_path = fixtures.make_features_lmdb(tmp, image_ids, feature_size=32)
    vocab = fixtures.make_vocab(tmp)

    cfg = zoo.vilbert(
        depth_text=4, cross_start=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg_path = os.path.join(tmp, "model.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json_string())

    yml = f"""
TASK12:
  name: NLVR2
  type: VL-binary-classifier
  num_labels: 2
  loss: BCEWithLogitLoss
  process: nlvr
  dataroot: {tmp}
  features_h5path1: {feat_path}
  features_h5path2: ''
  train_annotations_jsonpath: {ann_path}
  val_annotations_jsonpath: {ann_path}
  max_seq_length: 10
  max_region_num: 6
  batch_size: 4
  eval_batch_size: 4
  train_split: train
  val_split: train
  lr: 0.0005
  num_epoch: 2
"""
    yml_path = os.path.join(tmp, "tasks.yml")
    open(yml_path, "w").write(yml)

    import train_task

    argv = ["train_task.py",
            "--config_file", cfg_path,
            "--tasks_config_file", yml_path,
            "--task", "12",
            "--vocab_file", vocab,
            "--output_dir", os.path.join(tmp, "save"),
            "--logdir", os.path.join(tmp, "logs"),
            "--num_train_epochs", "2",
            "--num_workers", "0",
            "--compute_dtype", "float32",
            "--no_pallas"]
    with mock.patch.object(sys, "argv", argv):
        train_task.main()
    run = os.listdir(os.path.join(tmp, "save"))[0]
    assert os.path.isdir(os.path.join(tmp, "save", run, "best"))
