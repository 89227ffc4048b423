#!/usr/bin/env python
"""Merge per-group detector TSV chunks into one deduplicated TSV.

reference: data/*/merge_*_image.py (e.g.
data/flickr30k/merge_flickr30k_image.py:20-37) — the bottom-up-attention
extraction runs in N parallel groups writing ``<split>_obj36-36.tsv.<i>``;
this merges them, keeping the first occurrence of each img_id (groups can
overlap after restarts). The merged TSV feeds
tools/convert_features_lmdb.py / tools/serialize_cc.py.
"""

import argparse
import csv
import os
import sys


def merge(out_path: str, chunks) -> int:
    csv.field_size_limit(sys.maxsize)
    seen = set()
    # append semantics (like the reference): seed the dedup set from rows
    # already in the output so a rerun after a crash doesn't duplicate them
    if os.path.exists(out_path):
        with open(out_path, newline="") as f:
            for row in csv.reader(f, delimiter="\t"):
                if row:
                    seen.add(row[0])
    n = 0
    with open(out_path, "a", newline="") as out:
        writer = csv.writer(out, delimiter="\t")
        for chunk in chunks:
            with open(chunk, newline="") as f:
                for row in csv.reader(f, delimiter="\t"):
                    if not row:
                        continue
                    img_id = row[0]
                    if img_id in seen:
                        continue
                    seen.add(img_id)
                    writer.writerow(row)
                    n += 1
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True,
                   help="merged TSV (e.g. valid_obj36-36.tsv); appended "
                        "to if it exists, like the reference")
    p.add_argument("--chunks", nargs="*", default=[],
                   help="explicit chunk files; default <out>.0..N-1")
    p.add_argument("--total_group", type=int, default=0,
                   help="with no --chunks: number of <out>.<i> files")
    args = p.parse_args()

    chunks = args.chunks or [f"{args.out}.{i}"
                             for i in range(args.total_group)]
    if not chunks:
        raise SystemExit("give --chunks or --total_group")
    missing = [c for c in chunks if not os.path.exists(c)]
    if missing:
        raise SystemExit(f"missing chunk files: {missing}")
    n = merge(args.out, chunks)
    print(f"merged {len(chunks)} chunks -> {args.out} ({n} new rows)")


if __name__ == "__main__":
    main()
