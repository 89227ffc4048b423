#!/usr/bin/env python
"""Build the retrieval hard-negative pool: top-100 nearest images by mean
region feature (reference: scripts/generate_pool.py — BallTree over h5
features; here: LMDB features + sklearn or exact numpy fallback).

Usage: python scripts/generate_pool.py --features_lmdb F --annotations A \
    --task RetrievalFlickr30k --out datasets/flickr30k/hard_negative.pkl
"""

import argparse
import json
import pickle

import numpy as np


def mean_features(reader, image_ids):
    out = np.zeros((len(image_ids), reader.feature_size), np.float32)
    for i, iid in enumerate(image_ids):
        feats, num_boxes, _, _ = reader[iid]
        out[i] = feats[:num_boxes].mean(0)
    return out


def topk_neighbors(features, k=100):
    try:
        from sklearn.neighbors import BallTree
        tree = BallTree(features, metric="euclidean")
        return tree.query(features, k=k, return_distance=False)
    except Exception:
        # exact chunked L2 search
        n = len(features)
        out = np.zeros((n, k), np.int64)
        sq = (features ** 2).sum(1)
        for lo in range(0, n, 256):
            hi = min(lo + 256, n)
            d = sq[lo:hi, None] - 2 * features[lo:hi] @ features.T + sq[None]
            out[lo:hi] = np.argsort(d, axis=1)[:, :k]
        return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--features_lmdb", required=True)
    p.add_argument("--annotations", required=True)
    p.add_argument("--task", default="RetrievalFlickr30k")
    p.add_argument("--out", required=True)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--num_locs", type=int, default=5)
    args = p.parse_args()

    from volta_tpu.data.features_reader import ImageFeaturesReader

    image_ids = []
    with open(args.annotations) as f:
        for line in f:
            if not line.strip():
                continue
            ann = json.loads(line)
            if args.task == "RetrievalCOCO":
                image_ids.append(ann["id"])
            else:
                image_ids.append(int(ann["img_path"].split(".")[0]))

    reader = ImageFeaturesReader(args.features_lmdb, num_locs=args.num_locs)
    feats = mean_features(reader, image_ids)
    pool = topk_neighbors(feats, k=min(args.k, len(image_ids)))
    with open(args.out, "wb") as f:
        pickle.dump({"train_hard_pool": pool,
                     "train_image_list": image_ids}, f)
    print(f"wrote pool {pool.shape} for {len(image_ids)} images")


if __name__ == "__main__":
    main()
