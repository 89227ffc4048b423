#!/usr/bin/env python
"""Generate real-scale synthetic datasets for pipeline/throughput testing.

The driver environment has no access to the real Conceptual Captions / VQA
feature stores, so throughput work uses synthetic data with the exact
on-disk formats and shapes of the reference pipelines:

* ``vqa``  — region-feature LMDB with pickled base64-float32 records
  (reference: data/flickr30k/convert_flickr30k_lmdb.py:17-28) at the
  bottom-up-attention scale (36 boxes x 2048 dims), plus VQA v2 question
  JSONs, target pkls, and the answer space
  (reference: volta/datasets/vqa_dataset.py:120-187).
* ``cc``   — tensorpack-style 13-field msgpack LMDB shard + caption json
  (reference: volta/datasets/concept_cap_dataset.py:429-431,
  data/conceptual_captions/preprocess_cc_train.py:30-70).

Usage:
  python tools/make_synth_data.py vqa --out /root/synth/vqa --images 20000 \
      --questions 60000
  python tools/make_synth_data.py cc  --out /root/synth/cc  --images 20000
"""

import argparse
import base64
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORD_STEMS = [
    "dog", "cat", "man", "woman", "ball", "car", "tree", "house", "red",
    "blue", "green", "small", "large", "play", "run", "sit", "stand", "hold",
    "wear", "table", "chair", "street", "water", "sky", "grass", "food",
    "plate", "glass", "phone", "book", "sign", "light", "window", "door",
    "hand", "head", "shirt", "hat", "bag", "bike", "bus", "train", "plane",
    "boat", "bird", "horse", "cow", "sheep", "bear", "zebra",
]


def make_vocab(path, size=30522):
    """Write a WordPiece vocab of the reference's size (bert-base-uncased
    30522) so tokenizer throughput is realistic."""
    toks = ["[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    toks += list("abcdefghijklmnopqrstuvwxyz0123456789.,?!'-")
    toks += ["what", "where", "who", "why", "how", "is", "are", "the", "a",
             "an", "of", "on", "in", "at", "there", "color", "many", "doing",
             "and", "with", "to", "two", "three"]
    toks += WORD_STEMS
    i = 0
    while len(toks) < size:
        stem = WORD_STEMS[i % len(WORD_STEMS)]
        n = i // len(WORD_STEMS)
        toks.append(f"##{stem}{n}" if n % 2 else f"{stem}{n}")
        i += 1
    with open(path, "w") as f:
        f.write("\n".join(toks[:size]) + "\n")


def _boxes(rng, n, w, h):
    x1 = rng.rand(n, 1) * (w * 0.7)
    y1 = rng.rand(n, 1) * (h * 0.7)
    x2 = x1 + 8 + rng.rand(n, 1) * (w * 0.3 - 8)
    y2 = y1 + 8 + rng.rand(n, 1) * (h * 0.3 - 8)
    return np.concatenate([x1, y1, x2, y2], 1).astype(np.float32)


def gen_vqa(args):
    from volta_tpu.data import lmdbx

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    t0 = time.time()

    # ---- features LMDB (b64 float32, 36 boxes, 2048 dims)
    items, keys = [], []
    for i in range(args.images):
        key = str(1000000 + i).encode()
        keys.append(key)
        feats = (rng.randn(args.boxes, args.feat_dim) * 0.5).astype(np.float32)
        rec = {
            "img_id": 1000000 + i, "img_h": 480, "img_w": 640,
            "num_boxes": args.boxes,
            "features": base64.b64encode(feats.tobytes()),
            "boxes": base64.b64encode(_boxes(rng, args.boxes, 640,
                                             480).tobytes()),
        }
        items.append((key, pickle.dumps(rec)))
        if (i + 1) % 5000 == 0:
            print(f"  features {i + 1}/{args.images}", flush=True)
    items.append((b"keys", pickle.dumps(keys)))
    lmdb_path = os.path.join(args.out, "features.lmdb")
    lmdbx.write(lmdb_path, items)
    del items
    print(f"features LMDB: {args.images} images, "
          f"{os.path.getsize(lmdb_path) / 2**30:.2f} GiB, "
          f"{time.time() - t0:.0f}s", flush=True)

    # ---- answer space
    num_labels = args.num_labels
    ans2label = {f"answer{i}": i for i in range(num_labels)}
    with open(os.path.join(args.out, "trainval_ans2label.pkl"), "wb") as f:
        pickle.dump(ans2label, f)
    with open(os.path.join(args.out, "trainval_label2ans.pkl"), "wb") as f:
        pickle.dump([f"answer{i}" for i in range(num_labels)], f)

    # ---- questions + targets (train and a small val)
    def write_split(name, year, n_q):
        qs, ts = [], []
        for q in range(n_q):
            qid = q if name == "train" else 10_000_000 + q
            iid = 1000000 + int(rng.randint(args.images))
            words = [WORD_STEMS[int(j)] for j in
                     rng.randint(0, len(WORD_STEMS), rng.randint(4, 9))]
            qs.append({"question_id": qid, "image_id": iid,
                       "question": "what is the " + " ".join(words) + " ?"})
            ts.append({"question_id": qid, "image_id": iid,
                       "labels": [int(rng.randint(num_labels))],
                       "scores": [1.0]})
        with open(os.path.join(
                args.out,
                f"v2_OpenEnded_mscoco_{name}{year}_questions.json"),
                "w") as f:
            json.dump({"questions": qs}, f)
        os.makedirs(os.path.join(args.out, "cache"), exist_ok=True)
        with open(os.path.join(args.out, "cache", f"{name}_target.pkl"),
                  "wb") as f:
            pickle.dump(ts, f)

    write_split("train", "2014", args.questions)
    write_split("val", "2014", max(args.questions // 12, 1024))
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"vqa synth done in {time.time() - t0:.0f}s -> {args.out}",
          flush=True)


def gen_gqa(args):
    """GQA-layout annotations over an existing features LMDB (string
    question ids, dict-form questions json) — reuses the image ids of a
    ``vqa`` run's store via --features."""
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    num_labels = args.num_labels
    questions = {}
    for q in range(args.questions):
        iid = 1000000 + int(rng.randint(args.images))
        words = [WORD_STEMS[int(j)] for j in
                 rng.randint(0, len(WORD_STEMS), rng.randint(4, 9))]
        questions[f"g{q:07d}"] = {
            "imageId": iid,
            "question": "what is the " + " ".join(words) + " ?",
            "answer": f"answer{int(rng.randint(num_labels))}"}
    with open(os.path.join(args.out, "train_questions.json"), "w") as f:
        json.dump(questions, f)
    import pickle
    with open(os.path.join(args.out, "trainval_ans2label.pkl"), "wb") as f:
        pickle.dump({f"answer{i}": i for i in range(num_labels)}, f)
    with open(os.path.join(args.out, "trainval_label2ans.pkl"), "wb") as f:
        pickle.dump([f"answer{i}" for i in range(num_labels)], f)
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"gqa synth done -> {args.out}", flush=True)


def gen_retrieval(args):
    """Flickr30k-layout jsonlines annotations over an existing ``vqa``
    features store (reference: volta/datasets/retrieval_dataset.py:34-45 —
    ``img_path`` stem is the image id, 5 sentences per image). Gallery =
    the first --images ids of the store."""
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    path = os.path.join(args.out, "all_data_final_test_set0_2014.jsonline")
    with open(path, "w") as f:
        for i in range(args.images):
            sents = []
            for _ in range(args.sentences):
                words = [WORD_STEMS[int(j)] for j in
                         rng.randint(0, len(WORD_STEMS), rng.randint(6, 14))]
                sents.append("a photo of " + " ".join(words))
            f.write(json.dumps({"img_path": f"{1000000 + i}.jpg",
                                "sentences": sents}) + "\n")
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"retrieval synth done -> {path} "
          f"({args.images} images x {args.sentences} sentences)", flush=True)


def gen_visual7w(args):
    """Visual7w-pointing-layout corpus: dataset.json (boxes + images with
    4-way pointing qa_pairs) plus det (100-box) and GT feature LMDBs keyed
    by image id; GT records store the image's candidate boxes in sorted
    box-id order (reference: visual7w_pointing_dataset.py:243-292 — the
    V-logit-mc head gathers target slots at det_off=101 + choice index)."""
    from volta_tpu.data import lmdbx

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    gt_per_img = 8
    boxes_json, images_json = [], []
    gt_items, gt_keys = [], []
    det_items, det_keys = [], []
    qa_id = 0
    for i in range(args.images):
        image_id = 2000000 + i
        key = str(image_id).encode()
        ids = [image_id * 100 + j for j in range(gt_per_img)]
        gt_boxes = _boxes(rng, gt_per_img, 640, 480)
        for bid, bb in zip(ids, gt_boxes):
            boxes_json.append({"box_id": bid, "x": float(bb[0]),
                               "y": float(bb[1]),
                               "width": float(bb[2] - bb[0]),
                               "height": float(bb[3] - bb[1])})
        qa_pairs = []
        for _ in range(args.qa_per_image):
            cand = rng.choice(gt_per_img, 4, replace=False)
            words = [WORD_STEMS[int(j)] for j in
                     rng.randint(0, len(WORD_STEMS), rng.randint(3, 6))]
            qa_pairs.append({
                "qa_id": qa_id,
                "question": "which " + " ".join(words) + " ?",
                "multiple_choices": [ids[int(c)] for c in cand[1:]],
                "answer": ids[int(cand[0])]})
            qa_id += 1
        images_json.append({"split": "train", "image_id": image_id,
                            "qa_pairs": qa_pairs})
        # GT store: candidate boxes in sorted box-id order (= generation
        # order here); det store: 100 detector boxes
        gt_keys.append(key)
        gt_items.append((key, pickle.dumps({
            "img_id": image_id, "img_h": 480, "img_w": 640,
            "num_boxes": gt_per_img,
            "features": base64.b64encode(
                (rng.randn(gt_per_img, args.feat_dim) * 0.5).astype(
                    np.float32).tobytes()),
            "boxes": base64.b64encode(gt_boxes.tobytes())})))
        det_keys.append(key)
        det_items.append((key, pickle.dumps({
            "img_id": image_id, "img_h": 480, "img_w": 640,
            "num_boxes": 100,
            "features": base64.b64encode(
                (rng.randn(100, args.feat_dim) * 0.5).astype(
                    np.float32).tobytes()),
            "boxes": base64.b64encode(
                _boxes(rng, 100, 640, 480).tobytes())})))
    det_items.append((b"keys", pickle.dumps(det_keys)))
    gt_items.append((b"keys", pickle.dumps(gt_keys)))
    lmdbx.write(os.path.join(args.out, "v7w_feat.lmdb"), det_items)
    lmdbx.write(os.path.join(args.out, "v7w_gt_feat.lmdb"), gt_items)
    json.dump({"boxes": boxes_json, "images": images_json},
              open(os.path.join(args.out, "dataset.json"), "w"))
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"visual7w synth done in {time.time() - t0:.0f}s -> {args.out} "
          f"({args.images} images, {qa_id} qa)", flush=True)


def gen_refcoco(args):
    """RefCOCO+-layout REFER corpus: refs(unc).p pickle + instances.json
    (ann boxes) + a det-feature LMDB keyed by image id (reference:
    tools/refer/refer.py + volta/datasets/refer_expression_dataset.py).
    Each ref's box coincides with one detector box so the V-logit IoU
    target has a 1.0 slot."""
    from volta_tpu.data import lmdbx

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    refs, anns = [], []
    items, keys = [], []
    sent_id = 0
    for i in range(args.images):
        image_id = 3000000 + i
        det_boxes = _boxes(rng, args.boxes, 640, 480)
        key = str(image_id).encode()
        keys.append(key)
        items.append((key, pickle.dumps({
            "img_id": image_id, "img_h": 480, "img_w": 640,
            "num_boxes": args.boxes,
            "features": base64.b64encode(
                (rng.randn(args.boxes, args.feat_dim) * 0.5).astype(
                    np.float32).tobytes()),
            "boxes": base64.b64encode(det_boxes.tobytes())})))
        for r in range(args.refs_per_image):
            k = int(rng.randint(args.boxes))
            bb = det_boxes[k]
            ann_id = image_id * 10 + r
            anns.append({"id": ann_id,
                         "bbox": [float(bb[0]), float(bb[1]),
                                  float(bb[2] - bb[0]),
                                  float(bb[3] - bb[1])]})
            words = [WORD_STEMS[int(j)] for j in
                     rng.randint(0, len(WORD_STEMS), rng.randint(2, 6))]
            refs.append({"split": "train", "ann_id": ann_id,
                         "image_id": image_id, "ref_id": ann_id,
                         "sentences": [{"raw": "the " + " ".join(words)}],
                         "sent_ids": [sent_id]})
            sent_id += 1
    items.append((b"keys", pickle.dumps(keys)))
    lmdbx.write(os.path.join(args.out, "refcoco+_feat.lmdb"), items)
    with open(os.path.join(args.out, "refs(unc).p"), "wb") as f:
        pickle.dump(refs, f)
    json.dump({"annotations": anns},
              open(os.path.join(args.out, "instances.json"), "w"))
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"refcoco synth done in {time.time() - t0:.0f}s -> {args.out} "
          f"({args.images} images, {sent_id} refs)", flush=True)


def gen_flickr_grounding(args):
    """Flickr30k-Entities-layout grounding corpus: {split}.txt image list,
    Annotations/<img>.xml box files (object name = phrase id),
    Sentences/<img>.txt with [/EN#id/type phrase] span markup, plus det +
    GT feature LMDBs (reference: volta/datasets/
    flickr_grounding_dataset.py:60-183)."""
    from volta_tpu.data import lmdbx

    os.makedirs(args.out, exist_ok=True)
    ann_dir = os.path.join(args.out, "Annotations")
    sent_dir = os.path.join(args.out, "Sentences")
    os.makedirs(ann_dir, exist_ok=True)
    os.makedirs(sent_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    phr_per_img = 4
    det_items, gt_items, det_keys, gt_keys = [], [], [], []
    names = []
    phrase_id = 1
    for i in range(args.images):
        img = str(4000000 + i)
        names.append(img)
        gt_boxes = _boxes(rng, phr_per_img, 640, 480)
        xml = ["<annotation><size><width>640</width>"
               "<height>480</height></size>"]
        sent_words = []
        for p in range(phr_per_img):
            pid = phrase_id
            phrase_id += 1
            bb = gt_boxes[p].astype(int)
            xml.append(
                f"<object><name>{pid}</name><bndbox>"
                f"<xmin>{bb[0] + 1}</xmin><ymin>{bb[1] + 1}</ymin>"
                f"<xmax>{bb[2] + 1}</xmax><ymax>{bb[3] + 1}</ymax>"
                f"</bndbox></object>")
            words = [WORD_STEMS[int(j)] for j in
                     rng.randint(0, len(WORD_STEMS), 2)]
            sent_words.append(f"[/EN#{pid}/other {words[0]} {words[1]}]")
        xml.append("</annotation>")
        with open(os.path.join(ann_dir, img + ".xml"), "w") as f:
            f.write("".join(xml))
        with open(os.path.join(sent_dir, img + ".txt"), "w") as f:
            f.write("A photo with " + " and ".join(sent_words) + " .\n")
        key = img.encode()
        det_keys.append(key)
        det_items.append((key, pickle.dumps({
            "img_id": img, "img_h": 480, "img_w": 640, "num_boxes": 36,
            "features": base64.b64encode(
                (rng.randn(36, args.feat_dim) * 0.5).astype(
                    np.float32).tobytes()),
            "boxes": base64.b64encode(_boxes(rng, 36, 640, 480).tobytes())})))
        gt_keys.append(key)
        gt_items.append((key, pickle.dumps({
            "img_id": img, "img_h": 480, "img_w": 640,
            "num_boxes": phr_per_img,
            "features": base64.b64encode(
                (rng.randn(phr_per_img, args.feat_dim) * 0.5).astype(
                    np.float32).tobytes()),
            "boxes": base64.b64encode(gt_boxes.tobytes())})))
    det_items.append((b"keys", pickle.dumps(det_keys)))
    gt_items.append((b"keys", pickle.dumps(gt_keys)))
    lmdbx.write(os.path.join(args.out, "flickr_feat.lmdb"), det_items)
    lmdbx.write(os.path.join(args.out, "flickr_gt_feat.lmdb"), gt_items)
    with open(os.path.join(args.out, "train.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"flickr_grounding synth done in {time.time() - t0:.0f}s -> "
          f"{args.out} ({args.images} images, {phrase_id - 1} phrases)",
          flush=True)


def gen_guesswhat(args):
    """GuessWhat?!-layout oracle annotations over an existing ``vqa``
    features store: jsonl dialogs with qas turns answered Yes/No/N/A
    (reference: volta/datasets/guesswhat_dataset.py:28-55)."""
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    answers = ["Yes", "No", "N/A"]
    qid = 0
    with open(os.path.join(args.out, "guesswhat.train.jsonl"), "w") as f:
        n_dialogs = max(1, args.questions // 4)
        for _ in range(n_dialogs):
            iid = 1000000 + int(rng.randint(args.images))
            qas = []
            for _ in range(int(rng.randint(2, 7))):
                words = [WORD_STEMS[int(j)] for j in
                         rng.randint(0, len(WORD_STEMS), rng.randint(3, 8))]
                qas.append({"id": qid,
                            "question": "is it " + " ".join(words) + " ?",
                            "answer": answers[int(rng.randint(3))]})
                qid += 1
            f.write(json.dumps({"image": {"id": iid}, "qas": qas}) + "\n")
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"guesswhat synth done -> {args.out} ({qid} qa turns)", flush=True)


def gen_visdial(args):
    """VisDial v1.0-layout annotations over an existing ``vqa`` features
    store: data{questions, answers, dialogs} with 10 rounds per dialog
    (reference: volta/datasets/visdial_dataset.py layout)."""
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)

    def words(lo, hi):
        return " ".join(WORD_STEMS[int(j)] for j in
                        rng.randint(0, len(WORD_STEMS),
                                    int(rng.randint(lo, hi))))

    questions = [words(3, 8) + " ?" for _ in range(500)]
    answers = [words(1, 4) for _ in range(120)]
    n_dialogs = max(1, args.questions // 10)
    dialogs = []
    for _ in range(n_dialogs):
        iid = 1000000 + int(rng.randint(args.images))
        dialog = []
        for _r in range(10):
            ans = int(rng.randint(len(answers)))
            opts = [int(x) for x in rng.randint(0, len(answers), 100)]
            gt = int(rng.randint(100))  # gt_index indexes answer_options
            opts[gt] = ans
            dialog.append({"question": int(rng.randint(len(questions))),
                           "answer": ans, "gt_index": gt,
                           "answer_options": opts})
        dialogs.append({"image_id": iid, "caption": words(4, 10),
                        "dialog": dialog})
    with open(os.path.join(args.out, "visdial_1.0_train.json"), "w") as f:
        json.dump({"data": {"questions": questions, "answers": answers,
                            "dialogs": dialogs}}, f)
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"visdial synth done -> {args.out} ({n_dialogs} dialogs)",
          flush=True)


def gen_dense_caption(args):
    """ReferDenseCaption (Visual-Genome region phrases) annotations over
    an existing ``vqa`` features store: ``[{id, regions: [{phrase,
    region_id, x, y, width, height}]}]`` (reference:
    volta/datasets/refer_dense_caption.py layout)."""
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    anns = []
    rid = 0
    n_images = max(1, args.questions // 3)
    for _ in range(n_images):
        iid = 1000000 + int(rng.randint(args.images))
        regions = []
        for _r in range(3):
            x, y = int(rng.randint(0, 500)), int(rng.randint(0, 380))
            regions.append({
                "phrase": " ".join(WORD_STEMS[int(j)] for j in
                                   rng.randint(0, len(WORD_STEMS), 4)),
                "region_id": rid, "x": x, "y": y,
                "width": int(rng.randint(30, 140)),
                "height": int(rng.randint(30, 100))})
            rid += 1
        anns.append({"id": iid, "regions": regions})
    with open(os.path.join(args.out, "region_descriptions.json"),
              "w") as f:
        json.dump(anns, f)
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"dense_caption synth done -> {args.out} "
          f"({n_images} images, {rid} regions)", flush=True)


def gen_madlibs(args):
    """Visual Madlibs fill-in-the-blank annotations over an existing
    ``vqa`` features store: ``[{image_id, question, labels, scores,
    question_id}]`` soft-target records (reference:
    volta/datasets/vismadlibs_dataset.py layout)."""
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    anns = []
    for q in range(args.questions):
        iid = 1000000 + int(rng.randint(args.images))
        k = int(rng.randint(1, 3))
        labels = sorted(int(x) for x in
                        rng.choice(args.num_labels, k, replace=False))
        anns.append({
            "image_id": iid,
            "question": " ".join(WORD_STEMS[int(j)] for j in
                                 rng.randint(0, len(WORD_STEMS), 5)),
            "labels": labels,
            "scores": [float(rng.choice([0.3, 0.6, 0.9, 1.0]))
                       for _ in range(k)],
            "question_id": q})
    with open(os.path.join(args.out, "madlibs_train.json"), "w") as f:
        json.dump(anns, f)
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"madlibs synth done -> {args.out} ({args.questions} blanks)",
          flush=True)


def gen_snli_ve(args):
    """SNLI-VE-layout annotations over an existing ``vqa`` features store:
    jsonl with Flickr30K_ID / sentence2 / annotator_labels (reference:
    volta/datasets/visual_entailment_dataset.py)."""
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    label_names = ["contradiction", "neutral", "entailment"]
    with open(os.path.join(args.out, "snli_ve_train.jsonl"), "w") as f:
        for _ in range(args.questions):
            iid = 1000000 + int(rng.randint(args.images))
            words = [WORD_STEMS[int(j)] for j in
                     rng.randint(0, len(WORD_STEMS), rng.randint(5, 12))]
            votes = [label_names[int(v)]
                     for v in rng.randint(0, 3, rng.randint(1, 5))]
            f.write(json.dumps({
                "Flickr30K_ID": str(iid),
                "sentence2": "a person " + " ".join(words),
                "annotator_labels": votes,
                "gold_label": votes[0]}) + "\n")
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"snli_ve synth done -> {args.out}", flush=True)


def gen_nlvr2(args):
    """NLVR2-layout corpus: feature LMDB keyed ``<base>-img{0,1}`` (two
    images per statement) + train jsonl with identifier/sentence/label
    (reference: volta/datasets/nlvr2_dataset.py:34-41)."""
    from volta_tpu.data import lmdbx

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    items, keys = [], []
    for i in range(args.images):
        for half in ("img0", "img1"):
            key = f"synth-{i}-{half}".encode()
            keys.append(key)
            feats = (rng.randn(args.boxes, args.feat_dim) * 0.5).astype(
                np.float32)
            rec = {
                "img_id": key.decode(), "img_h": 480, "img_w": 640,
                "num_boxes": args.boxes,
                "features": base64.b64encode(feats.tobytes()),
                "boxes": base64.b64encode(
                    _boxes(rng, args.boxes, 640, 480).tobytes()),
            }
            items.append((key, pickle.dumps(rec)))
    items.append((b"keys", pickle.dumps(keys)))
    path = os.path.join(args.out, "features.lmdb")
    lmdbx.write(path, items)
    print(f"features LMDB: {2 * args.images} images, "
          f"{os.path.getsize(path) / 2**30:.2f} GiB", flush=True)

    with open(os.path.join(args.out, "train.json"), "w") as f:
        for k in range(args.questions):
            i = int(rng.randint(args.images))
            words = [WORD_STEMS[int(j)] for j in
                     rng.randint(0, len(WORD_STEMS), rng.randint(5, 12))]
            f.write(json.dumps({
                "identifier": f"synth-{i}-{k}",
                "sentence": "there are " + " ".join(words),
                "label": "True" if rng.rand() < 0.5 else "False",
            }) + "\n")
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"nlvr2 synth done in {time.time() - t0:.0f}s -> {args.out}",
          flush=True)


def gen_vcr(args):
    """VCR-layout corpus: det + GT feature LMDBs keyed ``m<i>.jpg``,
    per-image metadata jsons with det-tag name lists, and train jsonl with
    mixed str/[tag] tokens x 4 answer + 4 rationale choices (reference:
    volta/datasets/vcr_dataset.py:302-395)."""
    from volta_tpu.data import lmdbx

    os.makedirs(args.out, exist_ok=True)
    meta_dir = os.path.join(args.out, "vcr1images")
    os.makedirs(meta_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    t0 = time.time()

    def write_store(name, n_boxes):
        items, keys = [], []
        for i in range(args.images):
            key = f"m{i}.jpg".encode()
            keys.append(key)
            feats = (rng.randn(n_boxes, args.feat_dim) * 0.5).astype(
                np.float32)
            rec = {
                "img_id": f"m{i}.jpg", "img_h": 480, "img_w": 640,
                "num_boxes": n_boxes,
                "features": base64.b64encode(feats.tobytes()),
                "boxes": base64.b64encode(
                    _boxes(rng, n_boxes, 640, 480).tobytes()),
            }
            items.append((key, pickle.dumps(rec)))
        items.append((b"keys", pickle.dumps(keys)))
        path = os.path.join(args.out, name)
        lmdbx.write(path, items)
        print(f"  {name}: {args.images} images, "
              f"{os.path.getsize(path) / 2**30:.2f} GiB", flush=True)

    write_store("vcr_feat.lmdb", args.boxes)
    write_store("vcr_gt_feat.lmdb", 8)

    objects = ["person", "dog", "car", "chair", "ball", "table", "book"]
    for i in range(args.images):
        n = int(rng.randint(2, 6))
        names = [objects[int(j)] for j in rng.randint(0, len(objects), n)]
        json.dump({"names": names},
                  open(os.path.join(meta_dir, f"m{i}.json"), "w"))

    def mixed_tokens(n_names):
        words = [WORD_STEMS[int(j)] for j in
                 rng.randint(0, len(WORD_STEMS), rng.randint(3, 7))]
        toks = [w for w in words]
        if rng.rand() < 0.7:
            toks.insert(int(rng.randint(len(toks))),
                        [int(rng.randint(n_names))])
        return toks

    ann_dir = os.path.join(args.out, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, "train.jsonl"), "w") as f:
        for k in range(args.questions):
            i = int(rng.randint(args.images))
            n_names = 2  # every names list has >= 2 entries
            f.write(json.dumps({
                "question": mixed_tokens(n_names) + ["?"],
                "answer_choices": [mixed_tokens(n_names) for _ in range(4)],
                "answer_label": int(rng.randint(4)),
                "rationale_choices": [mixed_tokens(n_names)
                                      for _ in range(4)],
                "rationale_label": int(rng.randint(4)),
                "img_id": f"train-{i}", "img_fn": f"m{i}.jpg",
                "metadata_fn": f"m{i}.json",
                "annot_id": f"train-{k}"}) + "\n")
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"vcr synth done in {time.time() - t0:.0f}s -> {args.out}",
          flush=True)


def gen_cc(args):
    from volta_tpu.data import lmdbx, serialization

    os.makedirs(args.out, exist_ok=True)
    feats_dir = os.path.join(args.out, "imgfeats")
    ann_dir = os.path.join(args.out, "annotations")
    os.makedirs(feats_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    t0 = time.time()

    for split, n in (("train", args.images),
                     ("valid", max(args.images // 10, 512))):
        items, keys, captions = [], [], {}
        for i in range(n):
            key = serialization.tensorpack_key(i)
            keys.append(key)
            nb = args.boxes
            feats = (rng.randn(nb, args.feat_dim) * 0.5).astype(np.float32)
            cls_prob = rng.rand(nb, 1601).astype(np.float32)
            cls_prob /= cls_prob.sum(-1, keepdims=True)
            attr_scores = rng.rand(nb, 401).astype(np.float32)
            attr_scores /= attr_scores.sum(-1, keepdims=True)
            words = [WORD_STEMS[int(j)] for j in
                     rng.randint(0, len(WORD_STEMS), rng.randint(6, 14))]
            caption = " ".join(words)
            rec = [feats, cls_prob,
                   rng.randint(0, 1600, (nb,)).astype(np.int64),
                   rng.rand(nb).astype(np.float32),
                   rng.randint(0, 400, (nb,)).astype(np.int64),
                   rng.rand(nb).astype(np.float32),
                   attr_scores, _boxes(rng, nb, 640, 480),
                   nb, 480, 640, i, caption]
            items.append((key, serialization.dumps(rec)))
            captions[str(i)] = caption
            if (i + 1) % 5000 == 0:
                print(f"  cc {split} {i + 1}/{n}", flush=True)
        items.append((b"__keys__", serialization.dumps(keys)))
        name = ("training_feat_all.lmdb" if split == "train"
                else "validation_feat_all.lmdb")
        lmdbx.write(os.path.join(feats_dir, name), items)
        del items
        cap = ("caption_train.json" if split == "train"
               else "caption_valid.json")
        with open(os.path.join(ann_dir, cap), "w") as f:
            json.dump(captions, f)
        print(f"cc {split}: {n} images, "
              f"{os.path.getsize(os.path.join(feats_dir, name)) / 2**30:.2f}"
              f" GiB", flush=True)
    make_vocab(os.path.join(args.out, "vocab.txt"))
    print(f"cc synth done in {time.time() - t0:.0f}s -> {args.out}",
          flush=True)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("vqa", "cc", "gqa", "retrieval", "vcr", "nlvr2",
                 "visual7w", "snli_ve", "refcoco", "guesswhat",
                 "flickr_grounding", "visdial", "dense_caption",
                 "madlibs"):
        sp = sub.add_parser(name)
        sp.add_argument("--out", required=True)
        sp.add_argument("--images", type=int, default=20000)
        sp.add_argument("--boxes", type=int, default=36)
        sp.add_argument("--feat_dim", type=int, default=2048)
        sp.add_argument("--seed", type=int, default=0)
        if name == "vqa":
            sp.add_argument("--questions", type=int, default=60000)
            sp.add_argument("--num_labels", type=int, default=3129)
        if name == "gqa":
            sp.add_argument("--questions", type=int, default=40000)
            sp.add_argument("--num_labels", type=int, default=1843)
        if name == "retrieval":
            sp.add_argument("--sentences", type=int, default=5)
        if name in ("vcr", "nlvr2", "snli_ve", "guesswhat", "visdial",
                    "dense_caption", "madlibs"):
            sp.add_argument("--questions", type=int, default=20000)
        if name == "madlibs":
            sp.add_argument("--num_labels", type=int, default=3129)
        if name == "visual7w":
            sp.add_argument("--qa_per_image", type=int, default=3)
        if name == "refcoco":
            sp.add_argument("--refs_per_image", type=int, default=3)
    args = p.parse_args()
    {"vqa": gen_vqa, "cc": gen_cc, "gqa": gen_gqa,
     "retrieval": gen_retrieval, "vcr": gen_vcr,
     "nlvr2": gen_nlvr2, "visual7w": gen_visual7w,
     "snli_ve": gen_snli_ve, "refcoco": gen_refcoco,
     "guesswhat": gen_guesswhat,
     "flickr_grounding": gen_flickr_grounding,
     "visdial": gen_visdial, "dense_caption": gen_dense_caption,
     "madlibs": gen_madlibs}[args.cmd](args)


if __name__ == "__main__":
    main()
