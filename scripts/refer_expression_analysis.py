#!/usr/bin/env python
"""Win/loss analysis between two referring-expression eval dumps.

CLI port of the reference's ``scripts/refer_expression.ipynb``: given two
``eval_task.py`` V-logit result files ({"id", "target", "IOU"} records,
e.g. refcoco/refcoco+/refcocog runs of different checkpoints), report each
run's accuracy at the IoU threshold and aggregate which caption words are
over-represented in the expressions one run localises (IoU >= thr) and the
other does not — the notebook's word-frequency win/loss tables.

Captions come from a json list of {"id": ..., "caption": ...} records (the
dataset entry caches written by the refer datasets can be exported to this
shape); without captions only the accuracy comparison is printed.
"""

import argparse
import json
import re
from collections import Counter

_TOKEN = re.compile(r"[a-z]+")
_POS_TAGGER = None  # resolved once: nltk.pos_tag, or False when unusable


def _pos_tag():
    global _POS_TAGGER
    if _POS_TAGGER is None:
        try:  # probe once — per-caption retries would re-pay tagger setup
            import nltk
            nltk.pos_tag(["probe"])
            _POS_TAGGER = nltk.pos_tag
        except Exception:  # noqa: BLE001 - nltk/tagger data absent
            _POS_TAGGER = False
    return _POS_TAGGER


def tokenize(text):
    toks = _TOKEN.findall(text.lower())
    tagger = _pos_tag()
    if tagger:  # POS-filter to content words when the tagger is usable
        keep = {"NN", "NNS", "JJ", "JJR", "JJS", "VB", "VBD", "VBG", "VBN"}
        toks = [w for w, t in tagger(toks) if t in keep] or toks
    return toks


def load(path):
    recs = json.load(open(path))
    return {int(r["id"]): float(r["IOU"]) for r in recs}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result", required=True)
    p.add_argument("--compare", required=True)
    p.add_argument("--captions", default="",
                   help="json list of {id, caption} records")
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--top", type=int, default=20)
    args = p.parse_args()

    a, b = load(args.result), load(args.compare)
    ids = sorted(set(a) & set(b))
    if not ids:
        raise SystemExit("no shared ids between the two result files")
    acc_a = sum(a[i] >= args.iou for i in ids) / len(ids)
    acc_b = sum(b[i] >= args.iou for i in ids) / len(ids)
    print(f"{args.result}: acc@{args.iou} = {100 * acc_a:.2f} "
          f"({len(ids)} shared expressions)")
    print(f"{args.compare}: acc@{args.iou} = {100 * acc_b:.2f}")

    wins = [i for i in ids if a[i] >= args.iou > b[i]]
    losses = [i for i in ids if b[i] >= args.iou > a[i]]
    print(f"won: {len(wins)}, lost: {len(losses)}")

    if not args.captions:
        return
    caps = {int(r["id"]): r["caption"]
            for r in json.load(open(args.captions))}
    freq, win_f, loss_f = Counter(), Counter(), Counter()
    win_set, loss_set = set(wins), set(losses)
    for i in ids:
        if i not in caps:
            continue
        toks = set(tokenize(caps[i]))
        freq.update(toks)
        if i in win_set:
            win_f.update(toks)
        if i in loss_set:
            loss_f.update(toks)

    def table(counter, label):
        print(f"-- top words in {label} (word  count  share-of-word)")
        for w, c in counter.most_common(args.top):
            print(f"  {w:20s} {c:5d}  {c / max(freq[w], 1):.2f}")

    table(win_f, "wins")
    table(loss_f, "losses")


if __name__ == "__main__":
    main()
