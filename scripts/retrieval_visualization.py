#!/usr/bin/env python
"""Visualize / compare retrieval eval dumps.

CLI port of the reference's ``scripts/Retrieval_visualization.ipynb``:
given one or two ``<split>_result.json`` files from ``eval_retrieval.py``
(per-caption ranked image indices, top 20), report recall@K, show each
caption's top-K retrieved gallery slots with the ground-truth hit marked,
and — when comparing two runs — list the captions one run gets right in
top-K that the other misses. With ``--image_dir`` and ``--plot`` it also
renders the top-K images into a PNG grid per sampled caption
(matplotlib; image files looked up as ``<image_dir>/<image_id>.jpg``).

The ground-truth image for caption ``i`` is ``i // captions_per_image``
(the gallery layout ``eval_retrieval.py`` scores against).
"""

import argparse
import json
import os
import random


def load_results(path):
    with open(path) as f:
        return json.load(f)


def hit_rank(ranked, gt):
    try:
        return ranked.index(gt)
    except ValueError:
        return len(ranked)


def recalls(results, cpi, ks=(1, 5, 10)):
    ranks = [hit_rank(r, i // cpi) for i, r in enumerate(results)]
    return {f"r{k}": 100.0 * sum(r < k for r in ranks) / len(ranks)
            for k in ks}, ranks


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result", required=True,
                   help="eval_retrieval <split>_result.json")
    p.add_argument("--compare", default="",
                   help="second run's result file to diff against")
    p.add_argument("--captions", default="",
                   help="optional json list of caption strings, index-"
                        "aligned with the result rows")
    p.add_argument("--captions_per_image", type=int, default=5)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--num_show", type=int, default=3,
                   help="captions to print/plot per bucket")
    p.add_argument("--image_dir", default="",
                   help="directory of <image_id>.jpg files for --plot")
    p.add_argument("--plot", default="",
                   help="write a PNG grid of the top-K retrievals here")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = random.Random(args.seed)
    res = load_results(args.result)
    caps = json.load(open(args.captions)) if args.captions else None
    cpi = args.captions_per_image

    rec, ranks = recalls(res, cpi)
    print(f"{args.result}: " +
          ", ".join(f"{k}={v:.2f}" for k, v in rec.items()))

    def show(idx):
        gt = idx // cpi
        cap = f" {caps[idx]!r}" if caps else ""
        top = res[idx][:args.topk]
        marks = ["*" if t == gt else " " for t in top]
        print(f"  caption {idx}{cap}: gt={gt} rank={ranks[idx]} "
              f"top{args.topk}=" +
              " ".join(f"{t}{m}" for t, m in zip(top, marks)))
        return top, gt

    hits = [i for i, r in enumerate(ranks) if r < args.topk]
    misses = [i for i, r in enumerate(ranks) if r >= args.topk]
    print(f"hits@{args.topk}: {len(hits)}, misses: {len(misses)}")
    shown = []
    for title, bucket in (("hits", hits), ("misses", misses)):
        print(f"-- sample {title}")
        for idx in rng.sample(bucket, min(args.num_show, len(bucket))):
            shown.append(show(idx))

    if args.compare:
        cmp_res = load_results(args.compare)
        if len(cmp_res) != len(res):
            raise SystemExit(
                f"--compare has {len(cmp_res)} captions but --result has "
                f"{len(res)} — the runs cover different splits")
        cmp_rec, cmp_ranks = recalls(cmp_res, cpi)
        print(f"{args.compare}: " +
              ", ".join(f"{k}={v:.2f}" for k, v in cmp_rec.items()))
        wins = [i for i in range(len(res))
                if ranks[i] < args.topk <= cmp_ranks[i]]
        losses = [i for i in range(len(res))
                  if cmp_ranks[i] < args.topk <= ranks[i]]
        print(f"won@{args.topk} vs compare: {len(wins)}, "
              f"lost: {len(losses)}")
        for title, bucket in (("wins", wins), ("losses", losses)):
            print(f"-- sample {title}")
            for idx in rng.sample(bucket, min(args.num_show, len(bucket))):
                show(idx)

    if args.plot and args.image_dir and shown:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from PIL import Image

        nrows = len(shown)
        fig, axes = plt.subplots(nrows, args.topk,
                                 figsize=(3 * args.topk, 3 * nrows),
                                 squeeze=False)
        for r, (top, gt) in enumerate(shown):
            for c, img_id in enumerate(top[:args.topk]):
                ax = axes[r][c]
                path = os.path.join(args.image_dir, f"{img_id}.jpg")
                if os.path.exists(path):
                    ax.imshow(Image.open(path))
                ax.set_title(f"{img_id}" + (" (gt)" if img_id == gt else ""),
                             color="green" if img_id == gt else "black")
                ax.axis("off")
        fig.tight_layout()
        fig.savefig(args.plot)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
