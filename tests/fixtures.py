"""Synthetic data fixtures: tiny LMDB feature stores, annotations, vocab."""

import base64
import json
import os
import pickle

import numpy as np

from volta_tpu.data import lmdbx
from volta_tpu.data.tokenization import write_tiny_vocab

WORDS = ["a", "the", "dog", "cat", "red", "ball", "is", "on", "in", "man",
         "woman", "what", "color", "there", "two", "##s", "play", "run"]


def make_vocab(tmpdir):
    path = os.path.join(tmpdir, "vocab.txt")
    write_tiny_vocab(path, WORDS)
    return path


def make_roberta_vocab(tmpdir):
    """Byte-level BPE vocab dir (vocab.json + merges.txt) covering every
    byte unit plus the RoBERTa specials — any text encodes (one token per
    byte, no merges). Matches volta_tpu.data.bpe.RobertaTokenizer's
    from_pretrained layout."""
    from volta_tpu.data.bpe import bytes_to_unicode

    d = os.path.join(tmpdir, "roberta_vocab")
    os.makedirs(d, exist_ok=True)
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for u in bytes_to_unicode().values():
        vocab.setdefault(u, len(vocab))
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    return d


def make_features_lmdb(tmpdir, image_ids, num_boxes=6, feature_size=32,
                       seed=0, name="feat.lmdb"):
    rng = np.random.RandomState(seed)
    items = []
    keys = []
    for iid in image_ids:
        key = str(iid).encode()
        keys.append(key)
        feats = rng.randn(num_boxes, feature_size).astype(np.float32)
        x1 = rng.rand(num_boxes, 1) * 300
        y1 = rng.rand(num_boxes, 1) * 200
        boxes = np.concatenate(
            [x1, y1, x1 + 1 + rng.rand(num_boxes, 1) * 100,
             y1 + 1 + rng.rand(num_boxes, 1) * 100], 1).astype(np.float32)
        rec = {
            "img_h": 480, "img_w": 640,
            "features": base64.b64encode(feats.tobytes()),
            "boxes": base64.b64encode(boxes.tobytes()),
        }
        items.append((key, pickle.dumps(rec)))
    items.append((b"keys", pickle.dumps(keys)))
    path = os.path.join(tmpdir, name)
    lmdbx.write(path, items)
    return path


def make_vqa_annotations(tmpdir, image_ids, n_questions=12, num_labels=9):
    rng = np.random.RandomState(1)
    questions = []
    answers = []
    for qid in range(n_questions):
        iid = int(image_ids[qid % len(image_ids)])
        questions.append({
            "question_id": qid, "image_id": iid,
            "question": "what color is the %s ?" % WORDS[qid % 5 + 2],
        })
        answers.append({
            "question_id": qid, "image_id": iid,
            "labels": [int(rng.randint(num_labels))],
            "scores": [1.0],
        })
    with open(os.path.join(tmpdir,
                           "v2_OpenEnded_mscoco_train2014_questions.json"),
              "w") as f:
        json.dump({"questions": questions}, f)
    os.makedirs(os.path.join(tmpdir, "cache"), exist_ok=True)
    with open(os.path.join(tmpdir, "cache", "train_target.pkl"), "wb") as f:
        pickle.dump(answers, f)
    ans = {("answer%d" % i): i for i in range(num_labels)}
    with open(os.path.join(tmpdir, "trainval_ans2label.pkl"), "wb") as f:
        pickle.dump(ans, f)
    with open(os.path.join(tmpdir, "trainval_label2ans.pkl"), "wb") as f:
        pickle.dump([k for k, _ in sorted(ans.items(), key=lambda x: x[1])],
                    f)


def make_nlvr2_annotations(tmpdir, n=8):
    path = os.path.join(tmpdir, "train.json")
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "identifier": f"split-{i}-0",
                "sentence": "there are two dogs",
                "label": "True" if i % 2 else "False",
            }) + "\n")
    return path, [f"split-{i}-img0" for i in range(n)] + \
        [f"split-{i}-img1" for i in range(n)]


def make_concap_lmdb(tmpdir, n=16, num_boxes=5, feature_size=32, seed=3,
                     split="train"):
    """tensorpack-LMDBSerializer-style shard with the 13-field CC records."""
    from volta_tpu.data import serialization

    rng = np.random.RandomState(seed)
    items = []
    keys = []
    captions = {}
    for i in range(n):
        key = serialization.tensorpack_key(i)
        keys.append(key)
        feats = rng.randn(num_boxes, feature_size).astype(np.float32)
        cls_prob = np.abs(rng.rand(num_boxes, 1601)).astype(np.float32)
        cls_prob /= cls_prob.sum(-1, keepdims=True)
        attr_scores = np.abs(rng.rand(num_boxes, 401)).astype(np.float32)
        x1 = rng.rand(num_boxes, 1) * 300
        y1 = rng.rand(num_boxes, 1) * 200
        boxes = np.concatenate(
            [x1, y1, x1 + 50, y1 + 40], 1).astype(np.float32)
        caption = "a red ball on the %s" % WORDS[i % 6]
        rec = [feats, cls_prob,
               rng.randint(0, 1600, (num_boxes,)).astype(np.int64),
               rng.rand(num_boxes).astype(np.float32),
               rng.randint(0, 400, (num_boxes,)).astype(np.int64),
               rng.rand(num_boxes).astype(np.float32),
               attr_scores, boxes, num_boxes, 480, 640, i, caption]
        items.append((key, serialization.dumps(rec)))
        captions[str(i)] = caption
    items.append((b"__keys__", serialization.dumps(keys)))
    name = "training_feat_all.lmdb" if split == "train" else \
        "validation_feat_all.lmdb"
    feats_dir = os.path.join(tmpdir, "imgfeats")
    os.makedirs(feats_dir, exist_ok=True)
    lmdbx.write(os.path.join(feats_dir, name), items)
    ann_dir = os.path.join(tmpdir, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    cap_name = "caption_train.json" if split == "train" else \
        "caption_valid.json"
    with open(os.path.join(ann_dir, cap_name), "w") as f:
        json.dump(captions, f)
    return feats_dir, ann_dir


def make_retrieval_annotations(tmpdir, image_ids, sentences_per=2):
    path = os.path.join(tmpdir, "train_ann.jsonl")
    with open(path, "w") as f:
        for iid in image_ids:
            f.write(json.dumps({
                "img_path": f"{iid}.jpg",
                "sentences": ["a dog plays with a ball"] * sentences_per,
            }) + "\n")
    return path


def make_concap_shards(tmpdir, n_per_shard=16, shards=2, num_boxes=5,
                       feature_size=32, seed=3):
    """Per-rank CC LMDB shards (reference naming
    ``training_feat_part_<rank>.lmdb``, concept_cap_dataset.py:194-198)
    with disjoint records + one merged caption file."""
    from volta_tpu.data import serialization

    feats_dir = os.path.join(tmpdir, "imgfeats")
    ann_dir = os.path.join(tmpdir, "annotations")
    os.makedirs(feats_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    captions = {}
    for s in range(shards):
        rng = np.random.RandomState(seed + 17 * s)
        items, keys = [], []
        for i in range(n_per_shard):
            gid = s * n_per_shard + i
            key = serialization.tensorpack_key(i)
            keys.append(key)
            feats = rng.randn(num_boxes, feature_size).astype(np.float32)
            cls_prob = np.abs(rng.rand(num_boxes, 1601)).astype(np.float32)
            cls_prob /= cls_prob.sum(-1, keepdims=True)
            attr_scores = np.abs(rng.rand(num_boxes, 401)).astype(np.float32)
            x1 = rng.rand(num_boxes, 1) * 300
            y1 = rng.rand(num_boxes, 1) * 200
            boxes = np.concatenate(
                [x1, y1, x1 + 50, y1 + 40], 1).astype(np.float32)
            caption = "a red ball on the %s" % WORDS[gid % 6]
            rec = [feats, cls_prob,
                   rng.randint(0, 1600, (num_boxes,)).astype(np.int64),
                   rng.rand(num_boxes).astype(np.float32),
                   rng.randint(0, 400, (num_boxes,)).astype(np.int64),
                   rng.rand(num_boxes).astype(np.float32),
                   attr_scores, boxes, num_boxes, 480, 640, gid, caption]
            items.append((key, serialization.dumps(rec)))
            captions[str(gid)] = caption
        items.append((b"__keys__", serialization.dumps(keys)))
        lmdbx.write(os.path.join(feats_dir,
                                 f"training_feat_part_{s}.lmdb"), items)
    with open(os.path.join(ann_dir, "caption_train.json"), "w") as f:
        json.dump(captions, f)
    return feats_dir, ann_dir
