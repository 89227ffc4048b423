#!/usr/bin/env python
"""GQA accuracy scorer (reference: scripts/GQA_score.py).

Usage: python scripts/gqa_score.py --preds_file P --truth_file T
Predictions: [{"questionId": str, "prediction": str}, ...]
Truth: {questionId: {"answer": str}} (GQA questions json).
"""

import argparse
import json


def evaluate(preds_list, truth_dict) -> float:
    score = 0.0
    for entry in preds_list:
        label = truth_dict[entry["questionId"]]["answer"]
        if entry["prediction"] in label:
            score += 1.0
    return score / max(len(preds_list), 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preds_file", required=True, type=str)
    p.add_argument("--truth_file", required=True, type=str)
    args = p.parse_args()
    preds = json.load(open(args.preds_file))
    truth = json.load(open(args.truth_file))
    print(100 * evaluate(preds, truth))


if __name__ == "__main__":
    main()
