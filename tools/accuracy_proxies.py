#!/usr/bin/env python
"""Accuracy-parity proxies for the 5 BASELINE driver configs (VERDICT #6).

No real datasets exist in this environment, so accuracy parity is proxied
by *overfit* end-to-end runs: for each driver config family, a synthetic
dataset with a deterministic (input -> label) mapping is built at 200-500
samples, the real CLI trains until the train-split score saturates, and
the eval CLI round-trips a prediction dump. A model/pipeline with broken
wiring (masking, pooling, loss reductions, label plumbing) cannot memorise
the mapping, so score ~1.0 is a strong smoke proof.

Configs (BASELINE.json "configs"):
  1. ctrl_visualbert  single-stream VQA      (train -> eval_task dump)
  2. ctrl_uniter      Flickr30k retrieval    (train -> eval_retrieval R@K)
  3. ctrl_vilbert     dual-stream NLVR2      (nlvr process)
  4. lxmert           GQA                    (string question ids)
  5. vilbert          CC pretraining         (train_concap loss curve)

Writes one JSON line per proxy and a summary file (--out PROXIES.json).
Run on CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python
tools/accuracy_proxies.py --out PROXIES_r2.json
"""

import argparse
import base64
import glob
import json
import os
import pickle
import re
import sys
import tempfile
import time
from unittest import mock

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = dict(
    hidden_size=64, num_attention_heads=4, intermediate_size=96,
    pooler_size=64, v_pooler_size=64, max_position_embeddings=80,
    v_feature_size=32, v_hidden_size=64, v_num_attention_heads=4,
    v_intermediate_size=96, clf_hidden_size=48, use_pallas=False,
)


def make_vocab(tmp, n_marks=300):
    from volta_tpu.data.tokenization import write_tiny_vocab

    words = ["what", "is", "the", "a", "photo", "of", "true", "false",
             "yes", "no", "img", "object", "there", "two", "red", "ball",
             "dog", "cat", "man", "woman", "play", "run", "##s"]
    words += [f"q{i}" for i in range(n_marks)]
    words += [f"img{i}" for i in range(64)]
    path = os.path.join(tmp, "vocab.txt")
    write_tiny_vocab(path, words)
    return path


def vocab_size(vocab_path):
    return sum(1 for _ in open(vocab_path))


def make_roberta_vocab(tmp):
    """Byte-level BPE vocab dir (vocab.json + merges.txt): every byte unit
    plus the RoBERTa specials, no merges — any text encodes one token per
    byte. Matches volta_tpu.data.bpe.RobertaTokenizer.from_pretrained."""
    from volta_tpu.data.bpe import bytes_to_unicode

    d = os.path.join(tmp, "roberta_vocab")
    os.makedirs(d, exist_ok=True)
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for u in bytes_to_unicode().values():
        vocab.setdefault(u, len(vocab))
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    return d, len(vocab)


def write_cfg(tmp, cfg):
    path = os.path.join(tmp, "model.json")
    with open(path, "w") as f:
        f.write(cfg.to_json_string())
    return path


def features_lmdb(tmp, image_ids, feature_size=32, boxes=6, seed=0):
    from volta_tpu.data import lmdbx

    rng = np.random.RandomState(seed)
    items, keys = [], []
    for iid in image_ids:
        key = str(iid).encode()
        keys.append(key)
        feats = rng.randn(boxes, feature_size).astype(np.float32)
        x1 = rng.rand(boxes, 1) * 300
        y1 = rng.rand(boxes, 1) * 200
        bx = np.concatenate([x1, y1, x1 + 60, y1 + 50], 1).astype(np.float32)
        items.append((key, pickle.dumps({
            "img_h": 480, "img_w": 640,
            "features": base64.b64encode(feats.tobytes()),
            "boxes": base64.b64encode(bx.tobytes())})))
    items.append((b"keys", pickle.dumps(keys)))
    path = os.path.join(tmp, "feat.lmdb")
    lmdbx.write(path, items)
    return path


def task_yml(tmp, task_id, body):
    path = os.path.join(tmp, "tasks.yml")
    with open(path, "w") as f:
        f.write(f"TASK{task_id}:\n" + body)
    return path


def run_train(tmp, cfg_path, yml_path, vocab, task, epochs, extra=()):
    import train_task

    argv = ["train_task.py", "--config_file", cfg_path,
            "--tasks_config_file", yml_path, "--task", str(task),
            "--vocab_file", vocab, "--output_dir", os.path.join(tmp, "save"),
            "--logdir", os.path.join(tmp, "logs"),
            "--num_train_epochs", str(epochs), "--num_workers", "0",
            "--compute_dtype", "float32", "--no_pallas",
            "--clip_grad_norm", "1.0", "--eval_period", "5",
            *extra]
    with mock.patch.object(sys, "argv", argv):
        train_task.main()
    scores = []
    for out in glob.glob(os.path.join(tmp, "logs", "*", "out.txt")):
        for line in open(out):
            m = re.search(r"VAL epoch (\d+) TASK\d+ loss ([\d.]+) "
                          r"score ([\d.]+)", line)
            if m:
                scores.append((int(m.group(1)), float(m.group(2)),
                               float(m.group(3))))
    return scores


def run_eval(tmp, cfg_path, yml_path, vocab, task, extra=()):
    import eval_task

    best = glob.glob(os.path.join(tmp, "save", "*", "best"))[0]
    argv = ["eval_task.py", "--config_file", cfg_path,
            "--tasks_config_file", yml_path, "--task", str(task),
            "--vocab_file", vocab, "--from_pretrained", best,
            "--output_dir", os.path.join(tmp, "results"),
            "--num_workers", "0", "--compute_dtype", "float32",
            "--no_pallas", *extra]
    with mock.patch.object(sys, "argv", argv):
        eval_task.main()
    dump = glob.glob(os.path.join(tmp, "results", "*", "*_result.json"))[0]
    return json.load(open(dump))


# --------------------------------------------------------------- proxy 1+4
def qa_proxy(model_name, n_questions=240, n_labels=8, epochs=150,
             string_qids=False):
    from volta_tpu import zoo

    tmp = tempfile.mkdtemp(prefix=f"proxy_{model_name}_")
    extra = ()
    seq_len = 12
    qword = "q{}".format
    if model_name == "roberta_uniter":
        # RoBERTa text path e2e (VERDICT r2 missing #3): byte-level BPE
        # tokenizer + offset position ids, activated the reference way
        # (--bert_model roberta*, volta train_task.py:179-180). With no
        # merges every byte is a token, so a digit key like "q239" is a
        # *composition* task (measured: score grinds to 0.33 at the same
        # budget that memorises single-wordpiece keys to 1.0). The proxy
        # verifies wiring, not capability — use single printable-ASCII
        # keys so each question carries its label in one byte token,
        # matching the information structure of the BERT proxies.
        vocab, vs = make_roberta_vocab(tmp)
        extra = ("--bert_model", "roberta-base")
        seq_len = 14  # <s> what is <c> ? </s> = 13 byte tokens
        n_questions = 94  # printable ASCII 33..126
        qword = lambda i: chr(33 + i)  # noqa: E731
        # 94 questions -> 3 steps/epoch; match the BERT proxies' ~1200
        # optimizer steps (240q x 8 steps x 150 epochs / ...)
        epochs = 400
        cfg = zoo.single_stream("uniter", depth=2, vocab_size=vs + 3,
                                model="roberta", **SMALL)
    elif model_name == "ctrl_visualbert":
        vocab = make_vocab(tmp)
        vs = vocab_size(vocab)
        cfg = zoo.single_stream("visualbert", depth=2, vocab_size=vs,
                                **SMALL)
    elif model_name == "lxmert":
        vocab = make_vocab(tmp)
        vs = vocab_size(vocab)
        cfg = zoo.lxmert(n_text=3, n_vision=2, n_cross=2, vocab_size=vs,
                         **{**SMALL, "num_locs": 4}, add_global_imgfeat=None,
                         visual_target_weights={"3": 6.667, "4": 6.667,
                                                "5": 6.667},
                         fusion_method="text")
    else:
        raise KeyError(model_name)
    cfg_path = write_cfg(tmp, cfg)
    # 5 images, coprime with n_labels=8: questions cycle image (i%5) and
    # label (i%8) independently, so the image alone carries ~no label
    # information and the model must use the question text from step one.
    # The old 12-image layout let the image pin the answer to a 2-way
    # choice (12 and 8 share factor 4) — a 50%-accuracy shortcut basin
    # whose escape within the epoch budget was a coin-flip over dropout
    # noise realizations (measured: the SAME int-threshold dropout scored
    # 1.0 / 0.86 / 0.50 across three shifted key streams), which made the
    # proxy flag healthy RNG changes as regressions.
    ids = list(range(100, 105))
    feat = features_lmdb(tmp, ids)
    rng = np.random.RandomState(7)

    if string_qids:
        name, task = "GQA", 15
        questions = {}
        targets = []
        ans2label = {f"answer{i}": i for i in range(n_labels)}
        for i in range(n_questions):
            qid = f"g{i:05d}"
            questions[qid] = {"imageId": ids[i % len(ids)],
                              "question": f"what is {qword(i)} ?",
                              "answer": f"answer{i % n_labels}"}
        with open(os.path.join(tmp, "train_questions.json"), "w") as f:
            json.dump(questions, f)
        with open(os.path.join(tmp, "trainval_ans2label.pkl"), "wb") as f:
            pickle.dump(ans2label, f)
        with open(os.path.join(tmp, "trainval_label2ans.pkl"), "wb") as f:
            pickle.dump([f"answer{i}" for i in range(n_labels)], f)
    else:
        name, task = "VQA", 1
        qs, ts = [], []
        for i in range(n_questions):
            qs.append({"question_id": i, "image_id": ids[i % len(ids)],
                       "question": f"what is {qword(i)} ?"})
            ts.append({"question_id": i, "image_id": ids[i % len(ids)],
                       "labels": [i % n_labels], "scores": [1.0]})
        with open(os.path.join(
                tmp, "v2_OpenEnded_mscoco_train2014_questions.json"),
                "w") as f:
            json.dump({"questions": qs}, f)
        os.makedirs(os.path.join(tmp, "cache"), exist_ok=True)
        with open(os.path.join(tmp, "cache", "train_target.pkl"),
                  "wb") as f:
            pickle.dump(ts, f)
        with open(os.path.join(tmp, "trainval_ans2label.pkl"), "wb") as f:
            pickle.dump({f"answer{i}": i for i in range(n_labels)}, f)
        with open(os.path.join(tmp, "trainval_label2ans.pkl"), "wb") as f:
            pickle.dump([f"answer{i}" for i in range(n_labels)], f)

    clf = "VL-classifier-GQA" if string_qids else "VL-classifier"
    loss = "CrossEntropyLoss" if string_qids else "BCEWithLogitLoss"
    yml = task_yml(tmp, task, f"""
  name: {name}
  type: {clf}
  num_labels: {n_labels}
  loss: {loss}
  process: normal
  dataroot: {tmp}
  features_h5path1: {feat}
  features_h5path2: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: {seq_len}
  max_region_num: 6
  batch_size: 32
  eval_batch_size: 32
  train_split: train
  val_split: train
  lr: 0.001
""")
    scores = run_train(tmp, cfg_path, yml, vocab, task, epochs, extra=extra)
    best = max(s for _, _, s in scores) / 100.0
    dump = run_eval(tmp, cfg_path, yml, vocab, task, extra=extra)
    ok = best >= 0.9 and len(dump) == n_questions
    if string_qids:
        ok = ok and all(isinstance(r["questionId"], str) or
                        str(r["questionId"]).startswith("g")
                        for r in dump[:5])
    return {"proxy": f"{model_name}-{name}", "train_score": best,
            "dump_records": len(dump), "ok": bool(ok)}


# ----------------------------------------------------------------- proxy 3
def nlvr2_proxy(epochs=120):
    from volta_tpu import zoo

    tmp = tempfile.mkdtemp(prefix="proxy_nlvr2_")
    vocab = make_vocab(tmp)
    cfg = zoo.vilbert(depth_text=4, cross_start=2,
                      vocab_size=vocab_size(vocab), **SMALL)
    cfg_path = write_cfg(tmp, cfg)
    n = 160
    rng = np.random.RandomState(3)
    image_ids = []
    with open(os.path.join(tmp, "train.json"), "w") as f:
        for i in range(n):
            label = bool(rng.randint(2))
            f.write(json.dumps({
                "identifier": f"split-{i}-0",
                "sentence": f"there is q{i}",
                "label": "True" if label else "False"}) + "\n")
            image_ids += [f"split-{i}-img0", f"split-{i}-img1"]
    feat = features_lmdb(tmp, image_ids)
    yml = task_yml(tmp, 12, f"""
  name: NLVR2
  type: VL-binary-classifier
  num_labels: 2
  loss: BCEWithLogitLoss
  process: nlvr
  dataroot: {tmp}
  features_h5path1: {feat}
  features_h5path2: ''
  train_annotations_jsonpath: {os.path.join(tmp, 'train.json')}
  val_annotations_jsonpath: {os.path.join(tmp, 'train.json')}
  max_seq_length: 12
  max_region_num: 6
  batch_size: 32
  eval_batch_size: 32
  train_split: train
  val_split: train
  lr: 0.001
""")
    scores = run_train(tmp, cfg_path, yml, vocab, 12, epochs)
    best = max(s for _, _, s in scores) / 100.0
    dump = run_eval(tmp, cfg_path, yml, vocab, 12)
    return {"proxy": "ctrl_vilbert-NLVR2", "train_score": best,
            "dump_records": len(dump), "ok": bool(best >= 0.9)}


# ----------------------------------------------------------------- proxy 2
def retrieval_proxy(epochs=500):
    """4-way retrieval train + R@K gallery eval.

    Design notes (measured, see VERDICT #6 work): with the reference's
    "mul" pooled fusion, toy-scale training from random init collapses
    into a saddle where the two pooler outputs develop exactly disjoint
    supports (fused product == 0, all 4 option logits tie at ln4 and the
    CE gradient through the poolers vanishes). The reference never trains
    retrieval from scratch — it fine-tunes an ITM-pretrained checkpoint.
    At proxy scale the collapse is driven by dropout noise + weight decay
    shrink: with both disabled the identical pipeline trains to ~0 loss
    with genuinely resampled negatives, covering every (caption, image)
    pair of a 6-image gallery so the eval_retrieval R@K is meaningful
    (not argmax-tie-break luck). A best-val-loss guard (< 0.5) rejects
    the tie-break false positive (loss pinned at ln4 == 1.386)."""
    from volta_tpu import zoo

    tmp = tempfile.mkdtemp(prefix="proxy_retrieval_")
    vocab = make_vocab(tmp)
    cfg = zoo.single_stream("uniter", depth=2,
                            vocab_size=vocab_size(vocab), **SMALL)
    cfg.hidden_dropout_prob = 0.0
    cfg.attention_probs_dropout_prob = 0.0
    cfg.v_hidden_dropout_prob = 0.0
    cfg.v_attention_probs_dropout_prob = 0.0
    cfg_path = write_cfg(tmp, cfg)
    ids = list(range(30, 36))
    feat = features_lmdb(tmp, ids)
    ann = os.path.join(tmp, "train_ann.jsonl")
    with open(ann, "w") as f:
        for j, iid in enumerate(ids):
            f.write(json.dumps({
                "img_path": f"{iid}.jpg",
                "sentences": [f"a photo of img{j}",
                              f"img{j} is there"]}) + "\n")
    yml = task_yml(tmp, 8, f"""
  name: RetrievalFlickr30k
  type: VL-logit
  num_labels: 1
  loss: CrossEntropyLoss
  process: retrieval
  dataroot: {tmp}
  features_h5path1: {feat}
  features_h5path2: ''
  train_annotations_jsonpath: {ann}
  val_annotations_jsonpath: {ann}
  max_seq_length: 10
  max_region_num: 6
  batch_size: 12
  eval_batch_size: 12
  train_split: train
  val_split: train
  lr: 0.001
""")
    scores = run_train(tmp, cfg_path, yml, vocab, 8, epochs,
                       extra=("--weight_decay", "0", "--eval_period", "25"))
    best = max(s for _, _, s in scores) / 100.0
    best_loss = min(l for _, l, _ in scores)

    import eval_retrieval
    from volta_tpu.data.datasets import retrieval as rmod

    argv = ["eval_retrieval.py", "--config_file", cfg_path,
            "--tasks_config_file", yml, "--task", "8",
            "--vocab_file", vocab,
            "--from_pretrained",
            glob.glob(os.path.join(tmp, "save", "*", "best"))[0],
            "--output_dir", os.path.join(tmp, "results"),
            "--num_workers", "0", "--compute_dtype", "float32",
            "--no_pallas"]
    orig_init = rmod.RetrievalDatasetVal.__init__

    def patched(self, *a, **kw):
        kw["gallery_chunk"] = 6
        return orig_init(self, *a, **kw)

    with mock.patch.object(rmod.RetrievalDatasetVal, "__init__", patched), \
            mock.patch.object(sys, "argv", argv):
        eval_retrieval.main()
    metrics = json.load(open(glob.glob(os.path.join(
        tmp, "results", "*", "*_metrics.json"))[0]))
    ir1 = metrics["image_retrieval"]["r1"] / 100.0
    tr1 = metrics["text_retrieval"]["r1"] / 100.0
    ok = best >= 0.9 and best_loss < 0.5 and ir1 >= 0.5 and tr1 >= 0.5
    return {"proxy": "ctrl_uniter-RetrievalFlickr30k", "train_score": best,
            "best_loss": best_loss, "ir_r1": ir1, "tr_r1": tr1,
            "ok": bool(ok)}


# ----------------------------------------------------------------- proxy 5
def concap_proxy(epochs=20):
    from volta_tpu import zoo
    from volta_tpu.data import lmdbx, serialization

    tmp = tempfile.mkdtemp(prefix="proxy_concap_")
    vocab = make_vocab(tmp)
    cfg = zoo.vilbert(depth_text=4, cross_start=2,
                      vocab_size=vocab_size(vocab), **SMALL)
    cfg_path = write_cfg(tmp, cfg)

    rng = np.random.RandomState(11)
    feats_dir = os.path.join(tmp, "imgfeats")
    ann_dir = os.path.join(tmp, "annotations")
    os.makedirs(feats_dir)
    os.makedirs(ann_dir)
    n, nb = 192, 6
    items, keys, captions = [], [], {}
    for i in range(n):
        key = serialization.tensorpack_key(i)
        keys.append(key)
        feats = rng.randn(nb, 32).astype(np.float32)
        cls_prob = rng.rand(nb, 1601).astype(np.float32)
        cls_prob /= cls_prob.sum(-1, keepdims=True)
        x1 = rng.rand(nb, 1) * 300
        y1 = rng.rand(nb, 1) * 200
        boxes = np.concatenate([x1, y1, x1 + 50, y1 + 40], 1).astype(
            np.float32)
        caption = f"a photo of q{i} there"
        items.append((key, serialization.dumps(
            [feats, cls_prob,
             rng.randint(0, 1600, (nb,)).astype(np.int64),
             rng.rand(nb).astype(np.float32),
             rng.randint(0, 400, (nb,)).astype(np.int64),
             rng.rand(nb).astype(np.float32),
             rng.rand(nb, 401).astype(np.float32),
             boxes, nb, 480, 640, i, caption])))
        captions[str(i)] = caption
    items.append((b"__keys__", serialization.dumps(keys)))
    lmdbx.write(os.path.join(feats_dir, "training_feat_all.lmdb"), items)
    json.dump(captions, open(os.path.join(ann_dir, "caption_train.json"),
                             "w"))

    import train_concap

    argv = ["train_concap.py", "--config_file", cfg_path,
            "--annotations_path", ann_dir, "--features_path", feats_dir,
            "--vocab_file", vocab, "--train_batch_size", "32",
            "--learning_rate", "2e-3", "--num_train_epochs", str(epochs),
            "--objective", "0", "--max_seq_length", "12",
            "--max_region_num", str(nb),
            "--output_dir", os.path.join(tmp, "save"),
            "--logdir", os.path.join(tmp, "logs"),
            "--num_workers", "0", "--compute_dtype", "float32",
            "--no_pallas", "--clip_grad_norm", "1.0"]
    with mock.patch.object(sys, "argv", argv):
        train_concap.main()
    losses = []
    for out in glob.glob(os.path.join(tmp, "logs", "*", "out.txt")):
        for line in open(out):
            m = re.search(r"masked_t ([\d.]+) masked_v ([\d.]+) "
                          r"itm ([\d.]+)", line)
            if m:
                losses.append(sum(float(m.group(i)) for i in (1, 2, 3)))
    if not losses:
        return {"proxy": "vilbert-ConceptualCaptions", "ok": False,
                "error": "no CC loss lines logged"}
    first, last = losses[0], min(losses[-3:])
    ok = len(losses) >= 4 and last < 0.7 * first
    return {"proxy": "vilbert-ConceptualCaptions", "first_loss": first,
            "final_loss": last, "n_log_lines": len(losses), "ok": bool(ok)}


# ----------------------------------------------------------------- proxy 6
def pointing_proxy(epochs=80):
    """Visual7w pointing overfit (V-logit-mc head, det+GT merged regions,
    101-slot candidate gather) — extends the proxy matrix beyond the 5
    driver configs to the pointing family."""
    import types

    from volta_tpu import zoo
    from tools.make_synth_data import gen_visual7w

    tmp = tempfile.mkdtemp(prefix="proxy_v7w_")
    gen_visual7w(types.SimpleNamespace(out=tmp, images=12, feat_dim=32,
                                       seed=0, qa_per_image=8))
    vocab = os.path.join(tmp, "vocab.txt")
    cfg = zoo.vilbert(depth_text=4, cross_start=2,
                      vocab_size=vocab_size(vocab), **SMALL)
    cfg_path = write_cfg(tmp, cfg)
    yml = task_yml(tmp, 4, f"""
  name: Visual7w
  type: V-logit-mc
  loss: BCEWithLogitLoss
  process: normal
  dataroot: {tmp}
  features_h5path1: {tmp}/v7w_feat.lmdb
  features_h5path2: {tmp}/v7w_gt_feat.lmdb
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 12
  max_region_num: 120
  batch_size: 32
  eval_batch_size: 32
  train_split: train
  val_split: train
  lr: 0.001
""")
    scores = run_train(tmp, cfg_path, yml, vocab, 4, epochs)
    best = max(s for _, _, s in scores) / 100.0
    dump = run_eval(tmp, cfg_path, yml, vocab, 4)
    ok = best >= 0.9 and len(dump) == 96
    return {"proxy": "vilbert-Visual7wPointing", "train_score": best,
            "dump_records": len(dump), "ok": bool(ok)}


PROXIES = {
    "visualbert_vqa": lambda: qa_proxy("ctrl_visualbert"),
    "uniter_retrieval": retrieval_proxy,
    "vilbert_nlvr2": nlvr2_proxy,
    "lxmert_gqa": lambda: qa_proxy("lxmert", string_qids=True),
    "vilbert_concap": concap_proxy,
    "vilbert_pointing": pointing_proxy,
    "roberta_vqa": lambda: qa_proxy("roberta_uniter"),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", nargs="*", default=list(PROXIES))
    p.add_argument("--out", default="")
    args = p.parse_args()
    results = []
    for name in args.only:
        t0 = time.time()
        try:
            res = PROXIES[name]()
        except Exception as e:  # record the failure, keep going
            res = {"proxy": name, "ok": False, "error": repr(e)}
        res["seconds"] = round(time.time() - t0, 1)
        results.append(res)
        print(json.dumps(res), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    sys.exit(0 if all(r["ok"] for r in results) else 1)


if __name__ == "__main__":
    main()
