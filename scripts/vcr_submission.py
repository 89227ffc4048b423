#!/usr/bin/env python
"""Build a VCR leaderboard submission CSV from Q->A and QA->R prediction
dumps (reference: scripts/VCR_submission.py).

Usage: python scripts/vcr_submission.py QA_RESULT QAR0 QAR1 QAR2 QAR3 \
    TEST_JSONL OUT_CSV
Each QAR<i> is the rationale prediction dump produced with answer choice i
forced as context.
"""

import csv
import json
import sys

import numpy as np


def main():
    qa = json.load(open(sys.argv[1]))
    qars = [json.load(open(p)) for p in sys.argv[2:6]]
    test_jsonl, out_csv = sys.argv[6], sys.argv[7]
    annot_ids = []
    with open(test_jsonl) as f:
        for line in f:
            if line.strip():
                annot_ids.append(json.loads(line)["annot_id"])

    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(
            ["annot_id"]
            + [f"answer_{i}" for i in range(4)]
            + [f"rationale_conditioned_on_a{i}_{j}"
               for i in range(4) for j in range(4)])
        for idx, annot_id in enumerate(annot_ids):
            row = [annot_id]
            row += [float(p) for p in qa[idx]["answer"]]
            for i in range(4):
                row += [float(p) for p in qars[i][idx]["answer"]]
            w.writerow(row)
    print(f"wrote {len(annot_ids)} rows to {out_csv}")


if __name__ == "__main__":
    main()
