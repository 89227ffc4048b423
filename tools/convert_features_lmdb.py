#!/usr/bin/env python
"""Convert bottom-up-attention TSV region features into a VOLTA LMDB.

reference: data/flickr30k/convert_flickr30k_lmdb.py (and the per-dataset
twins): each image becomes a pickled dict {img_id, img_h, img_w, num_boxes,
boxes (b64 float32 [N,4]), features (b64 float32 [N,2048])} keyed by image
id, plus a ``keys`` entry. Output is written with the framework's native
LMDB writer — no lmdb package needed.

Usage: python tools/convert_features_lmdb.py --tsv in1.tsv [in2.tsv ...] \
    --out features.lmdb
"""

import argparse
import base64
import csv
import pickle
import sys

csv.field_size_limit(sys.maxsize)

FIELDNAMES = ["img_id", "img_h", "img_w", "objects_id", "objects_conf",
              "attrs_id", "attrs_conf", "num_boxes", "boxes", "features"]


def rows(paths, fieldnames):
    for path in paths:
        with open(path, newline="") as f:
            reader = csv.DictReader(f, delimiter="\t", fieldnames=fieldnames)
            yield from reader


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--fields", nargs="*", default=FIELDNAMES)
    args = p.parse_args()

    from volta_tpu.data import lmdbx

    items = []
    keys = []
    for row in rows(args.tsv, args.fields):
        key = str(row["img_id"]).encode()
        rec = {
            "img_id": row["img_id"],
            "img_h": int(row["img_h"]),
            "img_w": int(row["img_w"]),
            "num_boxes": int(row["num_boxes"]),
            "boxes": row["boxes"].encode()
            if isinstance(row["boxes"], str) else row["boxes"],
            "features": row["features"].encode()
            if isinstance(row["features"], str) else row["features"],
        }
        # detector side-channels (objects/attrs/cls_prob) ride along when the
        # TSV carries them — the reference's per-dataset converters keep the
        # whole row (reference: data/refcoco_unc/convert_refcoco_unc_dets36_lmdb.py)
        for extra in ("objects_id", "objects_conf", "attrs_id", "attrs_conf",
                      "cls_prob", "attrs", "classes"):
            val = row.get(extra)
            if val is not None:
                rec[extra] = val.encode() if isinstance(val, str) else val
        items.append((key, pickle.dumps(rec)))
        keys.append(key)
    items.append((b"keys", pickle.dumps(keys)))
    lmdbx.write(args.out, items)
    print(f"wrote {len(keys)} images to {args.out}")


if __name__ == "__main__":
    main()
