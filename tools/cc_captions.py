#!/usr/bin/env python
"""Conceptual Captions caption-map builder (offline transform).

The reference derives each CC image's id from its URL —
``zlib.crc32(url) & 0xffffffff`` — when downloading
(reference: data/conceptual_captions/download_data.py:_file_name) and
builds the ``caption_{train,valid}.json`` id→caption maps inside its
tensorpack serializers (preprocess_cc_train.py:34-46,
preprocess_cc_valid.py:40-49). This CLI is that pure transform: GCC TSV
(caption<TAB>url) → caption json, with optional filtering to the ids that
actually have extracted features (the "valid ids" handling — images that
failed to download/extract are dropped).

Pairs with tools/serialize_cc.py (TSV features → LMDB shards).
"""

import argparse
import csv
import json
import sys
import zlib


def url_image_id(url: str) -> str:
    """reference: download_data.py _file_name (crc32 of the url)."""
    return str(zlib.crc32(url.encode("utf-8")) & 0xFFFFFFFF)


def build_captions(tsv_path: str, keep_ids=None) -> dict:
    csv.field_size_limit(sys.maxsize)
    captions = {}
    with open(tsv_path, newline="") as f:
        for row in csv.reader(f, delimiter="\t"):
            if len(row) < 2:
                continue
            caption, url = row[0], row[1]
            image_id = url_image_id(url)
            if keep_ids is not None and image_id not in keep_ids:
                continue
            captions[image_id] = caption
    return captions


def feature_ids(tsv_paths) -> set:
    """img_id column of detector-output TSVs (the successfully extracted
    subset)."""
    csv.field_size_limit(sys.maxsize)
    ids = set()
    for path in tsv_paths:
        with open(path, newline="") as f:
            for row in csv.reader(f, delimiter="\t"):
                if row:
                    ids.add(row[0])
    return ids


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gcc_tsv", required=True,
                   help="GCC-1.1.0 TSV: caption<TAB>url per line "
                        "(Train_GCC-training.tsv / "
                        "Validation_GCC-1.1.0-Validation.tsv)")
    p.add_argument("--out", required=True,
                   help="output caption json (caption_train.json / "
                        "caption_valid.json)")
    p.add_argument("--features_tsv", nargs="*", default=[],
                   help="optional detector TSV chunks; captions are "
                        "restricted to ids present there (drops failed "
                        "downloads/extractions)")
    args = p.parse_args()

    keep = feature_ids(args.features_tsv) if args.features_tsv else None
    captions = build_captions(args.gcc_tsv, keep)
    with open(args.out, "w") as f:
        json.dump(captions, f)
    kept = f" (filtered to {len(keep)} extracted ids)" if keep else ""
    print(f"wrote {len(captions)} captions to {args.out}{kept}")


if __name__ == "__main__":
    main()
