#!/usr/bin/env python
"""Serialise Conceptual Captions TSV region features into the tensorpack-
style LMDB shards that the pretraining loader reads.

reference: data/conceptual_captions/preprocess_cc_train.py (tensorpack
LMDBSerializer over a Conceptual_Caption dataflow). Records are msgpack
blobs of the 13 fields [features, cls_prob, obj_ids, obj_confs, attr_ids,
attr_confs, attr_scores, boxes, num_boxes, h, w, image_id, caption], keyed
``{idx:08}`` with a ``__keys__`` index.

Usage: python tools/serialize_cc.py --tsv train.tsv.0 [...] \
    --captions caption_train.json --out training_feat_all.lmdb \
    [--num_shards N]
"""

import argparse
import base64
import csv
import json
import sys

import numpy as np

csv.field_size_limit(sys.maxsize)

FIELDNAMES = ["image_id", "image_w", "image_h", "num_boxes", "boxes",
              "features", "cls_prob", "objects_id", "objects_conf",
              "attrs_id", "attrs_conf", "attrs_scores"]


def _b64(s, dtype, cols):
    arr = np.frombuffer(base64.b64decode(s), dtype=dtype)
    return arr.reshape(-1, cols) if cols > 1 else arr


def records(paths, captions):
    for path in paths:
        with open(path, newline="") as f:
            for row in csv.DictReader(f, delimiter="\t",
                                      fieldnames=FIELDNAMES):
                image_id = row["image_id"]
                caption = captions.get(str(image_id), "")
                n = int(row["num_boxes"])
                yield [
                    _b64(row["features"], np.float32, 2048)[:n],
                    _b64(row["cls_prob"], np.float32, 1601)[:n],
                    _b64(row["objects_id"], np.int64, 1)[:n],
                    _b64(row["objects_conf"], np.float32, 1)[:n],
                    _b64(row["attrs_id"], np.int64, 1)[:n],
                    _b64(row["attrs_conf"], np.float32, 1)[:n],
                    _b64(row["attrs_scores"], np.float32, 401)[:n]
                    if row.get("attrs_scores") else np.zeros((n, 401),
                                                             np.float32),
                    _b64(row["boxes"], np.float32, 4)[:n],
                    n, int(row["image_h"]), int(row["image_w"]),
                    image_id, caption,
                ]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", nargs="+", required=True)
    p.add_argument("--captions", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_shards", type=int, default=1)
    args = p.parse_args()

    from volta_tpu.data import lmdbx, serialization

    captions = json.load(open(args.captions))
    shards = [[] for _ in range(args.num_shards)]
    shard_keys = [[] for _ in range(args.num_shards)]
    for i, rec in enumerate(records(args.tsv, captions)):
        s = i % args.num_shards
        key = serialization.tensorpack_key(len(shard_keys[s]))
        shards[s].append((key, serialization.dumps(rec)))
        shard_keys[s].append(key)

    for s in range(args.num_shards):
        out = args.out if args.num_shards == 1 else \
            args.out.replace("_all.lmdb", f"_part_{s}.lmdb")
        items = shards[s] + [(b"__keys__",
                              serialization.dumps(shard_keys[s]))]
        lmdbx.write(out, items)
        print(f"shard {s}: {len(shard_keys[s])} records -> {out}")


if __name__ == "__main__":
    main()
