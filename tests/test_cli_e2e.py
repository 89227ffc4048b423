"""End-to-end CLI smoke tests on synthetic fixtures.

Equivalent of the reference's examples/*/train.sh golden runs but with tiny
synthetic data: train_task for 2 epochs must improve and checkpoint;
eval_task must load the checkpoint and dump predictions.
"""

import json
import os
import sys
from unittest import mock

import numpy as np
import pytest

import fixtures
from volta_tpu import zoo


def write_tiny_model_config(tmp_path):
    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    path = os.path.join(tmp_path, "model.json")
    with open(path, "w") as f:
        f.write(cfg.to_json_string())
    return path


def write_task_yml(tmp_path, feat_path):
    yml = f"""
TASK1:
  name: VQA
  type: VL-classifier
  num_labels: 9
  loss: BCEWithLogitLoss
  process: normal
  task_id: 1
  dataroot: {tmp_path}
  features_h5path1: {feat_path}
  features_h5path2: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 12
  max_region_num: 6
  batch_size: 4
  eval_batch_size: 4
  train_split: train
  val_split: train
  lr: 0.001
  num_epoch: 2
"""
    path = os.path.join(tmp_path, "tasks.yml")
    with open(path, "w") as f:
        f.write(yml)
    return path


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("e2e"))
    ids = [10, 11, 12]
    feat_path = fixtures.make_features_lmdb(tmp, ids, feature_size=32)
    fixtures.make_vqa_annotations(tmp, ids, n_questions=16, num_labels=9)
    vocab = fixtures.make_vocab(tmp)
    model_cfg = write_tiny_model_config(tmp)
    task_yml = write_task_yml(tmp, feat_path)
    return dict(tmp=tmp, vocab=vocab, model_cfg=model_cfg,
                task_yml=task_yml)


def test_train_then_eval_cli(workdir):
    import train_task

    tmp = workdir["tmp"]
    out_dir = os.path.join(tmp, "save")
    argv = ["train_task.py",
            "--config_file", workdir["model_cfg"],
            "--tasks_config_file", workdir["task_yml"],
            "--task", "1",
            "--vocab_file", workdir["vocab"],
            "--output_dir", out_dir,
            "--logdir", os.path.join(tmp, "logs"),
            "--num_train_epochs", "2",
            "--num_workers", "0",
            "--compute_dtype", "float32",
            "--no_pallas",
            "--clip_grad_norm", "1.0"]
    with mock.patch.object(sys, "argv", argv):
        train_task.main()

    run_dirs = os.listdir(out_dir)
    assert len(run_dirs) == 1
    run_dir = os.path.join(out_dir, run_dirs[0])
    assert os.path.isdir(os.path.join(run_dir, "ckpt"))
    assert os.path.isdir(os.path.join(run_dir, "best"))
    assert os.path.exists(os.path.join(run_dir, "command.txt"))

    import eval_task

    res_dir = os.path.join(tmp, "results")
    argv = ["eval_task.py",
            "--config_file", workdir["model_cfg"],
            "--tasks_config_file", workdir["task_yml"],
            "--task", "1",
            "--vocab_file", workdir["vocab"],
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
    assert set(preds[0]) == {"question_id", "answer"}
    assert preds[0]["answer"].startswith("answer")


def test_resume_from_checkpoint(workdir):
    """Crash-recovery: a second run resumes from the saved step."""
    import train_task

    tmp = workdir["tmp"]
    out_dir = os.path.join(tmp, "save")
    run_dir = os.path.join(out_dir, os.listdir(out_dir)[0])
    argv = ["train_task.py",
            "--config_file", workdir["model_cfg"],
            "--tasks_config_file", workdir["task_yml"],
            "--task", "1",
            "--vocab_file", workdir["vocab"],
            "--output_dir", out_dir,
            "--logdir", os.path.join(tmp, "logs"),
            "--num_train_epochs", "3",
            "--num_workers", "0",
            "--compute_dtype", "float32",
            "--no_pallas",
            "--clip_grad_norm", "1.0"]
    with mock.patch.object(sys, "argv", argv):
        train_task.main()
    # a later-step checkpoint now exists
    from volta_tpu.checkpoint import latest_step
    assert latest_step(os.path.join(run_dir, "ckpt")) >= 12


def test_export_torch_checkpoint_cli(workdir):
    """The exporter CLI reads the orbax `best` checkpoint a training run
    wrote and emits a torch .bin the reference's BertForVLTasks loads with
    strict=True (the 'train here, deploy in torch' migration path,
    reference naming: volta/encoders.py:1117-1155)."""
    from _reference_oracle import load_reference, reference_available
    if not reference_available():
        pytest.skip("reference checkout not present")
    import yaml

    tmp = workdir["tmp"]
    out_dir = os.path.join(tmp, "save")
    run_dir = os.path.join(out_dir, os.listdir(out_dir)[0])
    out_bin = os.path.join(tmp, "exported.bin")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        import export_torch_checkpoint
    finally:
        sys.path.pop(0)
    argv = ["export_torch_checkpoint.py",
            "--config_file", workdir["model_cfg"],
            "--weights", os.path.join(run_dir, "best"),
            "--out", out_bin,
            "--tasks_config_file", workdir["task_yml"],
            "--task", "1",
            "--seq_len", "12", "--region_len", "6"]
    with mock.patch.object(sys, "argv", argv):
        export_torch_checkpoint.main()

    import torch

    ref = load_reference()
    ref_cfg = ref.config.BertConfig.from_json_file(workdir["model_cfg"])
    task_cfg = yaml.safe_load(open(workdir["task_yml"]))
    ref_model = ref.encoders.BertForVLTasks(ref_cfg, task_cfg, ["TASK1"])
    sd = torch.load(out_bin, map_location="cpu", weights_only=False)
    ref_model.load_state_dict(sd, strict=True)  # raises on any mismatch
    # and the trained (non-init) values actually made it across
    emb = sd["bert.embeddings.word_embeddings.weight"]
    assert float(emb.abs().sum()) > 0


def test_gqa_eval_dump(tmp_path):
    """GQA eval writes {questionId: str, prediction} records through the
    surrogate-index mapping (string question ids can't ride in batches)."""
    import json as _json
    import pickle

    import numpy as np

    from volta_tpu.data import ImageFeaturesReader
    from volta_tpu.data.datasets import GQAClassificationDataset
    from volta_tpu.data.tokenization import BertTokenizer
    import eval_task

    tmp = str(tmp_path)
    ids = [70, 71]
    feat_path = fixtures.make_features_lmdb(tmp, ids, feature_size=32)
    questions = {f"q{i:03d}": {"imageId": str(ids[i % 2]),
                               "question": "what color is the ball ?",
                               "answer": "red"} for i in range(6)}
    _json.dump(questions, open(os.path.join(tmp, "testdev_questions.json"),
                               "w"))
    ans = {"red": 0, "blue": 1, "green": 2}
    pickle.dump(ans, open(os.path.join(tmp, "trainval_ans2label.pkl"), "wb"))
    pickle.dump(["red", "blue", "green"],
                open(os.path.join(tmp, "trainval_label2ans.pkl"), "wb"))
    vocab = fixtures.make_vocab(tmp)
    cfg_path = write_tiny_model_config(tmp)

    yml = f"""
TASK15:
  name: GQA
  type: VL-classifier-GQA
  num_labels: 3
  loss: BCEWithLogitLoss
  process: normal
  dataroot: {tmp}
  features_h5path1: {feat_path}
  features_h5path2: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 12
  max_region_num: 6
  batch_size: 3
  eval_batch_size: 3
  train_split: testdev
  val_split: testdev
  lr: 0.0001
  num_epoch: 1
"""
    yml_path = os.path.join(tmp, "tasks.yml")
    open(yml_path, "w").write(yml)

    argv = ["eval_task.py", "--config_file", cfg_path,
            "--tasks_config_file", yml_path, "--task", "15",
            "--vocab_file", vocab,
            "--output_dir", os.path.join(tmp, "results"),
            "--num_workers", "0", "--compute_dtype", "float32",
            "--no_pallas"]
    with mock.patch.object(sys, "argv", argv):
        eval_task.main()
    run = os.listdir(os.path.join(tmp, "results"))[0]
    preds = _json.load(open(os.path.join(tmp, "results", run,
                                         "testdev_result.json")))
    assert len(preds) == 6
    assert sorted(p["questionId"] for p in preds) == sorted(questions)
    assert all(p["prediction"] in ans for p in preds)

    # the GQA scorer consumes this dump directly
    sys.path.insert(0, "scripts")
    import gqa_score
    acc = gqa_score.evaluate(preds, questions)
    assert 0.0 <= acc <= 1.0


def test_vlbert_vqa_fusion_override_cli(tmp_path):
    """Per-task ``fusion_method: vl-bert_vqa`` in the task YAML must reach
    the model config (reference: train_task.py:144-146) — the vl-bert
    model JSON itself says ``fusion_method: none`` and would otherwise
    have no pooled output to classify."""
    import train_task

    tmp = str(tmp_path)
    ids = [40, 41, 42]
    feat_path = fixtures.make_features_lmdb(tmp, ids, feature_size=32)
    fixtures.make_vqa_annotations(tmp, ids, n_questions=8, num_labels=9)
    vocab = fixtures.make_vocab(tmp)
    cfg = zoo.single_stream(
        "vl-bert", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32, type_vocab_size=3,
        v_coordinate_embeddings_dim=16, image_head_ln=False,
        add_global_imgfeat="last", fusion_method="none")
    cfg_path = os.path.join(tmp, "model.json")
    open(cfg_path, "w").write(cfg.to_json_string())
    yml = write_task_yml(tmp, feat_path)
    with open(yml, "a") as f:
        f.write("  fusion_method: vl-bert_vqa\n")

    out_dir = os.path.join(tmp, "save")
    argv = ["train_task.py", "--config_file", cfg_path,
            "--tasks_config_file", yml, "--task", "1",
            "--vocab_file", vocab, "--output_dir", out_dir,
            "--logdir", os.path.join(tmp, "logs"),
            "--num_train_epochs", "1", "--num_workers", "0",
            "--compute_dtype", "float32", "--no_pallas",
            "--clip_grad_norm", "1.0"]
    with mock.patch.object(sys, "argv", argv):
        train_task.main()
    run_dir = os.path.join(out_dir, os.listdir(out_dir)[0])
    assert os.path.isdir(os.path.join(run_dir, "best"))

    import eval_task

    res_dir = os.path.join(tmp, "results")
    argv = ["eval_task.py", "--config_file", cfg_path,
            "--tasks_config_file", yml, "--task", "1",
            "--vocab_file", vocab,
            "--from_pretrained", os.path.join(run_dir, "best"),
            "--output_dir", res_dir, "--num_workers", "0",
            "--compute_dtype", "float32", "--no_pallas"]
    with mock.patch.object(sys, "argv", argv):
        eval_task.main()
    res_run = os.listdir(res_dir)[0]
    preds = json.load(open(os.path.join(res_dir, res_run,
                                        "train_result.json")))
    assert len(preds) == 8


def test_visdial_dialog_process_cli(tmp_path):
    """VisualDialog (dialog process: rounds x options expansion) through
    train_task — regression for the VL-logit dialog-target flatten
    (reference: volta/task_utils.py:155). From-scratch option-ranking on
    synthetic data has a vanishing contrastive signal (options share
    near-identical pooled reps at init; the reference fine-tunes from
    pretrained weights), so this asserts the e2e mechanics, not
    convergence."""
    import train_task

    tmp = str(tmp_path)
    ids = [400, 401]
    feat_path = fixtures.make_features_lmdb(tmp, ids, feature_size=32)
    vocab = fixtures.make_vocab(tmp)
    words = ["red", "ball", "dog", "cat"]
    rng = np.random.RandomState(0)
    data = {"data": {
        "questions": [f"what is {w}" for w in words],
        "answers": words,
        "dialogs": [{
            "image_id": ids[d % 2], "caption": "a photo",
            "dialog": [
                {"question": int(rng.randint(4)),
                 "answer": int(rng.randint(4)),
                 "gt_index": int(rng.randint(4)),
                 "answer_options": list(range(4))}
                for _ in range(10)],
        } for d in range(4)],
    }}
    json.dump(data, open(os.path.join(tmp, "visdial_1.0_train.json"), "w"))
    cfg_path = write_tiny_model_config(tmp)
    yml = os.path.join(tmp, "tasks.yml")
    open(yml, "w").write(f"""
TASK3:
  name: VisualDialog
  type: VL-logit
  num_labels: 1
  loss: CrossEntropyLoss
  process: dialog
  task_id: 3
  dataroot: {tmp}
  features_h5path1: {feat_path}
  features_h5path2: ''
  train_annotations_jsonpath: {tmp}/visdial_1.0_train.json
  val_annotations_jsonpath: {tmp}/visdial_1.0_train.json
  max_seq_length: 16
  max_region_num: 6
  batch_size: 2
  train_split: train
  val_split: train
  lr: 0.001
  num_epoch: 1
""")
    out_dir = os.path.join(tmp, "save")
    argv = ["train_task.py", "--config_file", cfg_path,
            "--tasks_config_file", yml, "--task", "3",
            "--vocab_file", vocab, "--output_dir", out_dir,
            "--logdir", os.path.join(tmp, "logs"),
            "--num_train_epochs", "1", "--num_workers", "0",
            "--compute_dtype", "float32", "--no_pallas",
            "--clip_grad_norm", "1.0"]
    with mock.patch.object(sys, "argv", argv):
        train_task.main()
    run_dir = os.path.join(out_dir, os.listdir(out_dir)[0])
    assert os.path.isdir(os.path.join(run_dir, "best"))
    log = os.path.join(tmp, "logs")
    out = os.path.join(log, os.listdir(log)[0], "out.txt")
    assert any("VAL epoch" in l for l in open(out))


def test_eval_dump_attn_cli(workdir):
    """--dump_attn N writes per-batch .npz attention maps whose arrays
    follow the reference visualization structure: [B, H, Lq, Lk] probs
    rows summing to 1 over the joint key axis, plus queries/keys."""
    import numpy as np

    import eval_task

    tmp = workdir["tmp"]
    res_dir = os.path.join(tmp, "attn_results")
    argv = ["eval_task.py",
            "--config_file", workdir["model_cfg"],
            "--tasks_config_file", workdir["task_yml"],
            "--task", "1",
            "--vocab_file", workdir["vocab"],
            "--output_dir", res_dir,
            "--num_workers", "0",
            "--compute_dtype", "float32",
            "--no_pallas",
            "--dump_attn", "1"]
    with mock.patch.object(sys, "argv", argv):
        eval_task.main()

    path = os.path.join(res_dir, "attn_train_0.npz")
    assert os.path.exists(path)
    z = np.load(path)
    # tiny uniter: 2 attn sublayers, single-stream -> all four flows live
    t_intra = z["s00_t_intra_attn"]
    t_inter = z["s00_t_inter_attn"]
    assert "question_id" in z
    # self-describing row provenance (normal process: identity map)
    np.testing.assert_array_equal(z["row_qid_index"],
                                  np.arange(len(z["question_id"])))
    assert t_intra.ndim == 4 and t_inter.ndim == 4  # [B, H, Lq, Lk]
    assert t_intra.shape[:3] == t_inter.shape[:3]
    # joint softmax: tt and tv rows sum to 1 together
    joint = t_intra.sum(-1) + t_inter.sum(-1)
    np.testing.assert_allclose(joint, 1.0, atol=1e-5)
    assert any(k.endswith("_queries") for k in z.files)
    assert any(k.endswith("_v_intra_attn") for k in z.files)


@pytest.mark.slow
def test_orphan_datasets_cli_e2e(tmp_path):
    """ReferDenseCaption + VisMadLibs through the full train_task CLI on
    synthetic corpora (the num_labels-threading path and V-logit IoU
    targets; TPU twins: tools/run_hw_r5b.sh)."""
    import subprocess

    from volta_tpu import zoo

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""

    def run(*args):
        out = subprocess.run([sys.executable, *args], capture_output=True,
                             text=True, cwd=repo, env=env)
        assert out.returncode == 0, out.stderr[-2000:]
        return out

    base = str(tmp_path)
    run("tools/make_synth_data.py", "vqa", "--out", f"{base}/vqa",
        "--images", "60", "--questions", "30", "--boxes", "6",
        "--feat_dim", "32")
    run("tools/make_synth_data.py", "dense_caption", "--out", f"{base}/dc",
        "--images", "60", "--questions", "40")
    run("tools/make_synth_data.py", "madlibs", "--out", f"{base}/ml",
        "--images", "60", "--questions", "40", "--num_labels", "16")

    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=30522, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    with open(f"{base}/model.json", "w") as f:
        f.write(cfg.to_json_string())

    def task_yml(path, body):
        with open(path, "w") as f:
            f.write(body)

    task_yml(f"{base}/dc_tasks.yml", f"""TASK21:
  name: ReferDenseCaption
  type: V-logit
  loss: BCEWithLogitLoss
  process: normal
  task_id: 21
  dataroot: {base}/dc
  features_h5path1: {base}/vqa/features.lmdb
  features_h5path2: {base}/vqa/features.lmdb
  train_annotations_jsonpath: {base}/dc/region_descriptions.json
  val_annotations_jsonpath: {base}/dc/region_descriptions.json
  max_seq_length: 12
  max_region_num: 6
  batch_size: 8
  train_split: test
  val_split: test
  lr: 0.0004
  num_epoch: 1
""")
    task_yml(f"{base}/ml_tasks.yml", f"""TASK22:
  name: VisMadLibs
  type: VL-classifier
  loss: BCEWithLogitLoss
  process: normal
  task_id: 22
  dataroot: {base}/ml
  features_h5path1: {base}/vqa/features.lmdb
  features_h5path2: ''
  train_annotations_jsonpath: {base}/ml/madlibs_train.json
  val_annotations_jsonpath: {base}/ml/madlibs_train.json
  max_seq_length: 12
  max_region_num: 6
  batch_size: 8
  num_labels: 16
  train_split: train
  val_split: train
  lr: 0.0004
  num_epoch: 1
""")
    for task, yml, save in (("21", "dc_tasks.yml", "dc_save"),
                            ("22", "ml_tasks.yml", "ml_save")):
        out = run("train_task.py", "--config_file", f"{base}/model.json",
                  "--tasks_config_file", f"{base}/{yml}", "--task", task,
                  "--vocab_file", f"{base}/vqa/vocab.txt",
                  "--output_dir", f"{base}/{save}",
                  "--logdir", f"{base}/logs{task}",
                  "--num_train_epochs", "1", "--num_workers", "0",
                  "--compute_dtype", "float32", "--no_pallas",
                  "--clip_grad_norm", "1.0")
        assert "done; best val score" in out.stdout + out.stderr
