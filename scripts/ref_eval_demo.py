#!/usr/bin/env python
"""Referring-expression caption evaluation demo (CLI).

Port of the reference's ``tools/refer/pyEvalDemo.ipynb`` +
``evaluation/refEvaluation.py.__main__``: load a REFER dataset, score a
prediction file with the caption-metric suite (BLEU-1..4 / METEOR
substitute / ROUGE-L / CIDEr — see volta_tpu/tools/ref_evaluation.py), and
print corpus metrics plus the lowest-scoring expressions.

Prediction file: JSON — either ``{"predictions": [{"ref_id", "sent"}]}``
(the reference's tools/refer/test/sample_expressions_*.json shape) or a
bare list of the same records.
"""

import argparse
import json

from volta_tpu.tools.ref_evaluation import RefEvaluation
from volta_tpu.tools.refer import REFER


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True,
                   help="dir holding <dataset>/refs(<splitBy>).p + instances.json")
    p.add_argument("--dataset", default="refcoco")
    p.add_argument("--splitBy", default="unc")
    p.add_argument("--predictions", required=True)
    p.add_argument("--dump", default="",
                   help="write per-ref scores (evalRefs) to this json")
    p.add_argument("--worst", type=int, default=5,
                   help="print the N lowest-CIDEr expressions")
    args = p.parse_args()

    with open(args.predictions) as f:
        preds = json.load(f)
    if isinstance(preds, dict):
        preds = preds["predictions"]
    refer = REFER(args.data_root, args.dataset, args.splitBy)
    known = [p_ for p_ in preds if p_["ref_id"] in refer.Refs]
    if len(known) != len(preds):
        print(f"note: {len(preds) - len(known)} predictions have no GT ref "
              "and were skipped")

    ev = RefEvaluation(refer, known)
    ev.evaluate()
    for metric, score in sorted(ev.eval.items()):
        print(f"{metric}: {score:.3f}")

    if args.worst:
        ranked = sorted(ev.evalRefs, key=lambda e: e.get("CIDEr", 0.0))
        print(f"\nlowest-CIDEr {min(args.worst, len(ranked))} expressions:")
        by_id = {p_["ref_id"]: p_["sent"] for p_ in known}
        for e in ranked[: args.worst]:
            rid = e["ref_id"]
            gts = [s["sent"] for s in refer.Refs[rid]["sentences"]]
            print(f"  ref {rid}: CIDEr {e.get('CIDEr', 0.0):.2f} "
                  f"pred={by_id[rid]!r} gt={gts!r}")

    if args.dump:
        with open(args.dump, "w") as f:
            json.dump({"eval": ev.eval, "evalRefs": ev.evalRefs}, f, indent=1)
        print(f"wrote {args.dump}")


if __name__ == "__main__":
    main()
