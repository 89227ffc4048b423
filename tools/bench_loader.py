#!/usr/bin/env python
"""Measure host input-pipeline throughput (no device work).

The headline train step consumes ~2.8k samples/s on one v5e chip; the host
loader must sustain that rate to keep the device fed
(reference pipeline equivalents: torch DataLoader workers at
volta/task_utils.py:330-341; tensorpack ZMQ prefetch at
volta/datasets/concept_cap_dataset.py:202-222).

Usage:
  python tools/bench_loader.py vqa --data /root/synth/vqa [--batches 50]
  python tools/bench_loader.py cc  --data /root/synth/cc  [--batches 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(loader, n_batches, warmup=3, label=""):
    it = iter(loader)
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    samples = 0
    for _ in range(n_batches):
        batch = next(it)
        samples += len(next(iter(batch.values())))
    dt = time.perf_counter() - t0
    rate = samples / dt
    print(json.dumps({
        "metric": f"{label} loader throughput", "value": round(rate, 1),
        "unit": "samples/sec (host-only)",
        "per_batch_ms": round(1000 * dt / n_batches, 1)}), flush=True)
    return rate


def bench_vqa(args):
    from volta_tpu.data.datasets import DatasetMapTrain
    from volta_tpu.data.features_reader import ImageFeaturesReader
    from volta_tpu.data.loader import DataLoader
    from volta_tpu.data.tokenization import BertTokenizer

    tokenizer = BertTokenizer(os.path.join(args.data, "vocab.txt"))
    reader = ImageFeaturesReader(
        os.path.join(args.data, "features.lmdb"), num_locs=5,
        add_global_imgfeat="last", feature_size=2048,
        in_memory=args.in_memory)
    ds = DatasetMapTrain["VQA"](
        task="VQA", dataroot=args.data, annotations_jsonpath="",
        split="train", image_features_reader=reader,
        gt_image_features_reader=None, tokenizer=tokenizer,
        bert_model="bert-base-uncased", padding_index=0, max_seq_length=23,
        max_region_num=36, num_locs=5, add_global_imgfeat="last")
    if args.packed:
        t0 = time.time()
        ds.enable_packed(feat_dtype=args.feat_dtype)
        print(f"packed in {time.time() - t0:.0f}s", flush=True)
    loader = DataLoader(ds, args.batch_size, shuffle=True, drop_last=True,
                        num_workers=args.num_workers,
                        num_procs=args.num_procs)
    return bench(loader, args.batches, label="VQA")


def bench_cc(args):
    from volta_tpu.data.datasets.concap import make_concap_loader
    from volta_tpu.data.tokenization import BertTokenizer

    tokenizer = BertTokenizer(os.path.join(args.data, "vocab.txt"))
    _, loader = make_concap_loader(
        os.path.join(args.data, "imgfeats"),
        os.path.join(args.data, "annotations"), tokenizer,
        split="train", seq_len=36, region_len=36,
        batch_size=args.batch_size, num_workers=args.num_workers,
        objective=0, num_locs=5, add_global_imgfeat="last",
        num_procs=args.num_procs, packed=args.packed,
        feat_dtype=args.feat_dtype)
    return bench(loader, args.batches, label="CC")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["vqa", "cc"])
    p.add_argument("--data", required=True)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--batches", type=int, default=40)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--num_procs", type=int, default=0)
    p.add_argument("--in_memory", action="store_true")
    p.add_argument("--packed", action="store_true")
    p.add_argument("--feat_dtype", default="float32")
    args = p.parse_args()
    if args.task == "cc" and args.batch_size == 256:
        args.batch_size = 512
    (bench_vqa if args.task == "vqa" else bench_cc)(args)


if __name__ == "__main__":
    main()
