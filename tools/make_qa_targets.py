#!/usr/bin/env python
"""Build the QA soft-target pickles the datasets consume.

The reference ships VQA/GQA ``cache/<split>_target.pkl`` and
``trainval_{ans2label,label2ans}.pkl`` files prepared offline (referenced
at volta/datasets/vqa_dataset.py:120-187 / gqa_dataset.py); this tool
reconstructs them from the raw annotation downloads using the standard
VQA v2 soft-score recipe: answers normalised (articles / punctuation /
number words / contractions), the answer space = answers occurring >= 9
times in train+val, and per-question score = min(1, 0.3 * #annotators).

Usage:
  python tools/make_qa_targets.py vqa --dataroot datasets/vqa \
      --annotations v2_mscoco_train2014_annotations.json \
                    v2_mscoco_val2014_annotations.json
  python tools/make_qa_targets.py gqa --dataroot datasets/gqa \
      --questions train_balanced_questions.json --split train
"""

import argparse
import json
import os
import pickle
import re
from collections import Counter, defaultdict

_CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't",
    "couldve": "could've", "couldnt": "couldn't", "didnt": "didn't",
    "doesnt": "doesn't", "dont": "don't", "hadnt": "hadn't",
    "hasnt": "hasn't", "havent": "haven't", "hes": "he's", "im": "i'm",
    "isnt": "isn't", "itd": "it'd", "itll": "it'll", "its": "it's",
    "lets": "let's", "maam": "ma'am", "shes": "she's",
    "shouldve": "should've", "shouldnt": "shouldn't", "thats": "that's",
    "theres": "there's", "theyd": "they'd", "theyll": "they'll",
    "theyre": "they're", "theyve": "they've", "wasnt": "wasn't",
    "werent": "weren't", "whats": "what's", "wheres": "where's",
    "wholl": "who'll", "whos": "who's", "wont": "won't",
    "wouldve": "would've", "wouldnt": "wouldn't", "youd": "you'd",
    "youll": "you'll", "youre": "you're", "youve": "you've",
}
_NUMBERS = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10",
}
_ARTICLES = {"a", "an", "the"}
_PUNCT = re.compile(r"[;/\[\]\"{}()=+\\_\-><@`,?!.]")


def normalize_answer(ans: str) -> str:
    ans = ans.replace("\n", " ").replace("\t", " ").strip().lower()
    ans = _PUNCT.sub("", ans)
    ans = ans.replace(":", "").replace("'", "'")
    words = []
    for w in ans.split():
        w = _NUMBERS.get(w, w)
        w = _CONTRACTIONS.get(w, w)
        if w not in _ARTICLES:
            words.append(w)
    return " ".join(words)


def vqa_scores(answers):
    """VQA accuracy-style soft score per distinct answer: for each of the
    10 annotators, acc = min(1, #matching others / 3); the per-answer score
    is the mean over annotators — equivalently min(1, count * 0.3) on the
    deduplicated counts used by the standard preprocessing."""
    counts = Counter(normalize_answer(a["answer"]) for a in answers)
    return {a: min(1.0, 0.3 * c) for a, c in counts.items() if a}


def build_vqa(args):
    per_split = {}
    occur = Counter()
    for path in args.annotations:
        ann = json.load(open(path))["annotations"]
        split = "val" if "val" in os.path.basename(path) else "train"
        rows = []
        for a in ann:
            scores = vqa_scores(a["answers"])
            rows.append((a["question_id"], a["image_id"], scores))
            occur.update(Counter(
                normalize_answer(x["answer"]) for x in a["answers"]))
        per_split[split] = rows

    ans2label = {}
    for ans, c in sorted(occur.items()):
        if c >= args.min_occurrences and ans:
            ans2label[ans] = len(ans2label)
    label2ans = [a for a, _ in sorted(ans2label.items(),
                                      key=lambda kv: kv[1])]
    os.makedirs(os.path.join(args.dataroot, "cache"), exist_ok=True)
    with open(os.path.join(args.dataroot, "trainval_ans2label.pkl"),
              "wb") as f:
        pickle.dump(ans2label, f)
    with open(os.path.join(args.dataroot, "trainval_label2ans.pkl"),
              "wb") as f:
        pickle.dump(label2ans, f)

    for split, rows in per_split.items():
        out = []
        for qid, iid, scores in rows:
            labels, lscores = [], []
            for a, s in scores.items():
                if a in ans2label:
                    labels.append(ans2label[a])
                    lscores.append(s)
            out.append({"question_id": qid, "image_id": iid,
                        "labels": labels, "scores": lscores})
        path = os.path.join(args.dataroot, "cache", f"{split}_target.pkl")
        with open(path, "wb") as f:
            pickle.dump(out, f)
        print(f"{split}: {len(out)} targets, "
              f"{len(ans2label)} answers -> {path}")


def build_gqa(args):
    questions = json.load(open(args.questions))
    items = sorted(questions.items()) if isinstance(questions, dict) else \
        [(q["question_id"], q) for q in questions]
    a2l_path = os.path.join(args.dataroot, "trainval_ans2label.pkl")
    if os.path.exists(a2l_path):
        ans2label = pickle.load(open(a2l_path, "rb"))
    else:
        answers = sorted({str(v.get("answer", "")).lower()
                          for _, v in items} - {""})
        ans2label = {a: i for i, a in enumerate(answers)}
        os.makedirs(args.dataroot, exist_ok=True)
        with open(a2l_path, "wb") as f:
            pickle.dump(ans2label, f)
        with open(os.path.join(args.dataroot, "trainval_label2ans.pkl"),
                  "wb") as f:
            pickle.dump(list(answers), f)
    out = []
    for qid, v in items:
        ans = str(v.get("answer", "")).lower()
        lab = ans2label.get(ans)
        out.append({"question_id": qid, "image_id": v["imageId"],
                    "labels": [lab] if lab is not None else [],
                    "scores": [1.0] if lab is not None else []})
    os.makedirs(os.path.join(args.dataroot, "cache"), exist_ok=True)
    path = os.path.join(args.dataroot, "cache", f"{args.split}_target.pkl")
    with open(path, "wb") as f:
        pickle.dump(out, f)
    print(f"{args.split}: {len(out)} targets, "
          f"{len(ans2label)} answers -> {path}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("vqa")
    v.add_argument("--dataroot", required=True)
    v.add_argument("--annotations", nargs="+", required=True)
    v.add_argument("--min_occurrences", type=int, default=9)
    g = sub.add_parser("gqa")
    g.add_argument("--dataroot", required=True)
    g.add_argument("--questions", required=True)
    g.add_argument("--split", default="train")
    args = p.parse_args()
    (build_vqa if args.cmd == "vqa" else build_gqa)(args)


if __name__ == "__main__":
    main()
