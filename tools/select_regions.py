#!/usr/bin/env python
"""Filter a detection json to the top-N regions per image by score.

reference: data/refcoco_unc/select_regions.py (same flow for refcoco+_unc /
refcocog_umd): the referring-expression pipelines detect >36 candidate
boxes per image; training uses the 36 highest-scoring ones. The output json
keeps the reference's record schema (list of per-detection dicts with
image_id / det_id / score).

Usage: python tools/select_regions.py --infile dets.json \
    --outfile dets_36.json [--max_regions 36]
"""

import argparse
import json
from collections import defaultdict


def select(dets, max_regions):
    per_image = defaultdict(list)
    for d in dets:
        per_image[d["image_id"]].append(d)
    keep_ids = set()
    for img, ds in per_image.items():
        ds = sorted(ds, key=lambda d: d["score"], reverse=True)[:max_regions]
        keep_ids.update(d["det_id"] for d in ds)
    return [d for d in dets if d["det_id"] in keep_ids]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--infile", required=True)
    p.add_argument("--outfile", required=True)
    p.add_argument("--max_regions", type=int, default=36)
    args = p.parse_args()
    dets = json.load(open(args.infile))
    out = select(dets, args.max_regions)
    with open(args.outfile, "w") as f:
        json.dump(out, f)
    print(f"kept {len(out)}/{len(dets)} detections "
          f"(top {args.max_regions}/image)")


if __name__ == "__main__":
    main()
