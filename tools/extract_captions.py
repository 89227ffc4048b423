#!/usr/bin/env python
"""Karpathy-split caption extraction → retrieval annotation jsonl.

Covers the reference's per-dataset extractors in one CLI
(reference: data/flickr30k/extract_captions.py:1-52 and
data/mscoco/extract_captions.py:1-58): read a Karpathy ``dataset_*.json``
(``{"images": [{split, sentences:[{raw}], filename|cocoid, ...}]}``) and
write ``<outdir>/<split>_ann.jsonl`` records
``{"sentences": [...], "id": ..., ("img_path": ...)}`` consumed by the
retrieval datasets.

Dataset quirks replicated:
  * flickr30k: id = filename stem, img_path kept;
  * mscoco: id = cocoid; the *train* split absorbs ``restval``; the
    ``test1k`` split selects ids from an explicit id-list file.

No third-party jsonlines/tqdm needed — plain json lines.
"""

import argparse
import json
import os

SPLIT2NAME = {"train": "train", "valid": "val", "test": "test",
              "test1k": "test1k"}


def extract(infile: str, dataset: str, split: str,
            test1k_ids: str = "") -> list:
    images = json.load(open(infile))["images"]
    name = SPLIT2NAME[split]
    if split == "test1k" and dataset != "mscoco":
        raise SystemExit("--split test1k is mscoco-only (Karpathy flickr "
                         "has no test1k subset)")
    if dataset == "mscoco" and split == "test1k":
        if not test1k_ids:
            raise SystemExit("--test1k_ids required for split test1k")
        ids = {int(line.strip()) for line in open(test1k_ids)}
        subset = [e for e in images if e["cocoid"] in ids]
    else:
        subset = [e for e in images if e["split"] == name]
        if dataset == "mscoco" and split == "train":
            # the Karpathy coco train split absorbs restval
            # (reference: data/mscoco/extract_captions.py:25-27)
            subset += [e for e in images if e["split"] == "restval"]

    records = []
    for e in subset:
        sentences = [d["raw"] for d in e["sentences"]]
        if dataset == "flickr30k":
            name_ = e["filename"]
            records.append({"sentences": sentences,
                            "id": name_.split(".")[0], "img_path": name_})
        else:
            records.append({"sentences": sentences, "id": e["cocoid"]})
    return records


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--infile", required=True,
                   help="Karpathy dataset json (dataset_flickr30k.json / "
                        "dataset_coco.json)")
    p.add_argument("--outdir", required=True)
    p.add_argument("--dataset", choices=["flickr30k", "mscoco"],
                   required=True)
    p.add_argument("--split", default="valid",
                   choices=["train", "valid", "test", "test1k"])
    p.add_argument("--test1k_ids", default="",
                   help="mscoco test1k: file of cocoids, one per line")
    args = p.parse_args()

    records = extract(args.infile, args.dataset, args.split,
                      args.test1k_ids)
    os.makedirs(args.outdir, exist_ok=True)
    out = os.path.join(args.outdir, f"{args.split}_ann.jsonl")
    with open(out, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(records)} records to {out}")


if __name__ == "__main__":
    main()
