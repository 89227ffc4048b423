"""RoBERTa text encoder end-to-end (VERDICT r2 missing #3).

The reference activates RoBERTa purely via --bert_model (config.model =
"roberta", reference: train_task.py:179-180): offset position ids starting
at padding_idx+1=2 (volta/embeddings.py:82-93) and the byte-level BPE
tokenizer. This drives the real train_task/eval_task CLIs with the
from-scratch RobertaTokenizer on a synthetic VQA corpus — the previously
untraversed model-level path.
"""

import json
import os
import sys
from unittest import mock

import pytest

import fixtures
from volta_tpu import zoo


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("roberta_e2e"))
    ids = [30, 31, 32]
    feat_path = fixtures.make_features_lmdb(tmp, ids, feature_size=32)
    fixtures.make_vqa_annotations(tmp, ids, n_questions=16, num_labels=9)
    vocab_dir = fixtures.make_roberta_vocab(tmp)

    # tiny model config with the roberta flag set through the zoo override
    # path (vocab covers the 261-entry byte-level BPE table)
    cfg = zoo.build(
        "ctrl_uniter_base", model="roberta", depth=2, hidden_size=48,
        num_attention_heads=4, intermediate_size=64, pooler_size=48,
        v_pooler_size=48, vocab_size=264, max_position_embeddings=64,
        v_feature_size=32, v_hidden_size=48, v_num_attention_heads=4,
        v_intermediate_size=64, clf_hidden_size=32)
    model_cfg = os.path.join(tmp, "model.json")
    with open(model_cfg, "w") as f:
        f.write(cfg.to_json_string())

    task_yml = os.path.join(tmp, "tasks.yml")
    with open(task_yml, "w") as f:
        f.write(f"""
TASK1:
  name: VQA
  type: VL-classifier
  num_labels: 9
  loss: BCEWithLogitLoss
  process: normal
  task_id: 1
  dataroot: {tmp}
  features_h5path1: {feat_path}
  features_h5path2: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 14
  max_region_num: 6
  batch_size: 4
  eval_batch_size: 4
  train_split: train
  val_split: train
  lr: 0.001
  num_epoch: 3
""")
    return dict(tmp=tmp, vocab_dir=vocab_dir, model_cfg=model_cfg,
                task_yml=task_yml)


def test_zoo_roberta_override():
    cfg = zoo.build("ctrl_uniter_base", model="roberta")
    assert cfg.model == "roberta"
    # unrelated fields untouched
    assert cfg.image_embeddings == "uniter"


def test_roberta_train_then_eval_cli(workdir):
    import train_task

    tmp = workdir["tmp"]
    out_dir = os.path.join(tmp, "save")
    argv = ["train_task.py",
            "--config_file", workdir["model_cfg"],
            "--tasks_config_file", workdir["task_yml"],
            "--task", "1",
            "--bert_model", "roberta-base",
            "--vocab_file", workdir["vocab_dir"],
            "--output_dir", out_dir,
            "--logdir", os.path.join(tmp, "logs"),
            "--num_train_epochs", "3",
            "--num_workers", "0",
            "--compute_dtype", "float32",
            "--no_pallas",
            "--clip_grad_norm", "1.0"]
    with mock.patch.object(sys, "argv", argv):
        train_task.main()

    run_dir = os.path.join(out_dir, os.listdir(out_dir)[0])
    assert os.path.isdir(os.path.join(run_dir, "best"))
    # the roberta entry cache must be separate from the BERT one
    caches = os.listdir(os.path.join(tmp, "cache"))
    assert any("_roberta" in c for c in caches), caches
    # loss must decrease over the 3 epochs
    log_root = os.path.join(tmp, "logs")
    out_txt = None
    for root, _, files in os.walk(log_root):
        if "out.txt" in files:
            out_txt = os.path.join(root, "out.txt")
    losses = []
    for line in open(out_txt):
        if "VAL epoch" in line:
            losses.append(float(line.split("loss")[1].split()[0]))
    assert len(losses) == 3 and losses[-1] < losses[0], losses

    import eval_task

    res_dir = os.path.join(tmp, "results")
    argv = ["eval_task.py",
            "--config_file", workdir["model_cfg"],
            "--tasks_config_file", workdir["task_yml"],
            "--task", "1",
            "--bert_model", "roberta-base",
            "--vocab_file", workdir["vocab_dir"],
            "--from_pretrained", os.path.join(run_dir, "best"),
            "--output_dir", res_dir,
            "--num_workers", "0",
            "--compute_dtype", "float32",
            "--no_pallas"]
    with mock.patch.object(sys, "argv", argv):
        eval_task.main()

    res_run = os.listdir(res_dir)[0]
    preds = json.load(open(os.path.join(res_dir, res_run,
                                        "train_result.json")))
    assert len(preds) == 16
    assert preds[0]["answer"].startswith("answer")
