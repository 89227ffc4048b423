#!/usr/bin/env python
"""VCR Q->A / QA->R / Q->AR joint accuracy
(reference: scripts/VCR_Q_AR_evaluation.py).

Usage: python scripts/vcr_q_ar_evaluation.py QA_RESULT QAR_RESULT VAL_JSONL
"""

import json
import sys

import numpy as np


def load_ground_truth(path):
    out = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            ann = json.loads(line)
            out.append(dict(
                answer_label=ann["answer_label"],
                rationale_label=ann["rationale_label"],
                anno_id=int(ann["annot_id"].split("-")[1])))
    return out


def evaluate(qa_result, qar_result, ground_truth):
    gt_by_id = {g["anno_id"]: g for g in ground_truth}
    n = len(qa_result)
    qa_acc = qar_acc = joint_acc = 0
    for qa, qar in zip(qa_result, qar_result):
        gt = gt_by_id[int(qa["question_id"])]
        a_ok = int(np.argmax(qa["answer"])) == gt["answer_label"]
        r_ok = int(np.argmax(qar["answer"])) == gt["rationale_label"]
        qa_acc += a_ok
        qar_acc += r_ok
        joint_acc += a_ok and r_ok
    return qa_acc / n, qar_acc / n, joint_acc / n


def main():
    qa = json.load(open(sys.argv[1]))
    qar = json.load(open(sys.argv[2]))
    gt_path = sys.argv[3] if len(sys.argv) > 3 else "data/VCR/val.jsonl"
    gt = load_ground_truth(gt_path)
    a, r, ar = evaluate(qa, qar, gt)
    print(f"Q->A {100*a:.2f}  QA->R {100*r:.2f}  Q->AR {100*ar:.2f}")


if __name__ == "__main__":
    main()
