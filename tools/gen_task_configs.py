#!/usr/bin/env python
"""Generate per-model task config YAMLs from all_tasks.yml + overlays.

Mirrors the reference's config_tasks/{ctrl,vilbert,lxmert,vl-bert}_
{trainval,test}_tasks.yml surface: each model family pins its own lr /
batch sizes per task; test variants clear train_split and point val_split
at the test split.
"""

import copy
import os
import sys

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# per-model-family hyperparameter overlays (reference:
# config_tasks/*_trainval_tasks.yml)
OVERLAYS = {
    "ctrl": {},
    "vilbert": {
        "TASK1": {"lr": 4e-5},
        "TASK7": {"lr": 2e-5},
        "TASK8": {"lr": 2e-5},
    },
    "lxmert": {
        "TASK1": {"lr": 5e-5, "batch_size": 32},
        "TASK12": {"lr": 5e-5, "batch_size": 32},
        "TASK15": {"lr": 5e-5, "batch_size": 32},
    },
    "vl-bert": {
        "TASK1": {"lr": 1e-4},
        "TASK9": {"lr": 1e-5},
        "TASK10": {"lr": 1e-5},
        "TASK11": {"lr": 1e-5},
    },
}

TEST_SPLITS = {
    "TASK1": "test", "TASK2": "test", "TASK7": "test", "TASK8": "test",
    "TASK9": "test", "TASK10": "test", "TASK11": "test", "TASK12": "test",
    "TASK13": "test", "TASK15": "testdev",
}


def main(outdir=None):
    outdir = outdir or os.path.join(ROOT, "config_tasks")
    base = yaml.safe_load(open(os.path.join(outdir, "all_tasks.yml")))
    for family, overlay in OVERLAYS.items():
        trainval = copy.deepcopy(base)
        for task, kv in overlay.items():
            if task in trainval:
                trainval[task].update(kv)
        with open(os.path.join(outdir, f"{family}_trainval_tasks.yml"),
                  "w") as f:
            yaml.safe_dump(trainval, f, sort_keys=False)
        test = copy.deepcopy(trainval)
        for task, tc in test.items():
            tc["train_split"] = ""
            tc["val_split"] = TEST_SPLITS.get(task, "test")
            if task == "TASK1":
                tc["batch_size"] = min(tc.get("batch_size", 128), 128)
        with open(os.path.join(outdir, f"{family}_test_tasks.yml"),
                  "w") as f:
            yaml.safe_dump(test, f, sort_keys=False)
    print(f"wrote task configs to {outdir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
