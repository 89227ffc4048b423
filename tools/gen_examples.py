#!/usr/bin/env python
"""Regenerate the examples/ matrix (reference: examples/*/*/{train,test}.sh).

The reference's 76 shell scripts pin the per-modelxtask hyperparameters
that function as its golden configs (SURVEY.md §4.1). This generator emits
the same matrix against our CLIs: every reference (model, task) pair plus
extra pairs this framework also supports, with the reference's exact
optimizer settings (weight decay / correct_bias / clip / warmup — verified
per-file against /root/reference/examples).

Run: python tools/gen_examples.py
"""

import os
import shutil
import stat

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")

# task dir -> (TASK id, output name, eval entry)
TASKS = {
    "vqa": (1, "VQA", "eval_task.py"),
    "mscoco": (7, "RetrievalCOCO", "eval_retrieval.py"),
    "flickr30k": (8, "RetrievalFlickr30k", "eval_retrieval.py"),
    "refcoco_unc": (9, "refcoco", "eval_task.py"),
    "refcoco+_unc": (10, "refcoco+", "eval_task.py"),
    "refcocog_umd": (11, "refcocog", "eval_task.py"),
    "nlvr2": (12, "NLVR2", "eval_task.py"),
    "snli_ve": (13, "VisualEntailment", "eval_task.py"),
    "gqa": (15, "GQA", "eval_task.py"),
}

CTRL_FT = ("--adam_epsilon 1e-6 --adam_betas 0.9 0.999 --adam_correct_bias "
           "--weight_decay 0.0001 --warmup_proportion 0.1 "
           "--clip_grad_norm 1.0")

# model -> (config json, tasks-config prefix, fine-tune flags,
#           task dirs, extra per-task flag overrides)
MODELS = {
    "ctrl_uniter": ("ctrl_uniter_base", "ctrl", CTRL_FT,
                    ["vqa", "flickr30k", "refcoco+_unc", "nlvr2",
                     "snli_ve"], {}),
    "ctrl_vilbert": ("ctrl_vilbert_base", "ctrl", CTRL_FT,
                     ["vqa", "flickr30k", "refcoco+_unc", "nlvr2"], {}),
    "ctrl_visualbert": ("ctrl_visualbert_base", "ctrl", CTRL_FT,
                        ["vqa", "flickr30k", "refcoco+_unc", "nlvr2"], {}),
    "ctrl_vl-bert": ("ctrl_vl-bert_base", "ctrl", CTRL_FT,
                     ["vqa", "flickr30k", "refcoco+_unc", "nlvr2"], {}),
    "ctrl_lxmert": ("ctrl_lxmert", "ctrl", CTRL_FT,
                    ["vqa", "flickr30k", "refcoco+_unc", "nlvr2", "gqa"],
                    {}),
    "vilbert": ("vilbert_base", "vilbert",
                "--adam_epsilon 1e-6 --adam_betas 0.9 0.999 "
                "--weight_decay 0.01 --warmup_proportion 0.1 "
                "--clip_grad_norm 0.0",
                ["vqa", "mscoco", "flickr30k", "refcoco_unc",
                 "refcoco+_unc", "refcocog_umd", "nlvr2", "snli_ve", "gqa"],
                {}),
    "lxmert": ("lxmert", "lxmert",
               "--adam_epsilon 1e-6 --adam_betas 0.9 0.999 "
               "--adam_correct_bias --weight_decay 0.01 "
               "--warmup_proportion 0.1 --clip_grad_norm 5.0",
               ["vqa", "nlvr2", "gqa"], {}),
    "vl-bert": ("vl-bert_base", "vl-bert",
                "--adam_epsilon 1e-6 --adam_betas 0.9 0.999 "
                "--adam_correct_bias --weight_decay 0.0001 "
                "--clip_grad_norm 1.0",
                ["vqa", "refcoco+_unc"],
                {"vqa": "--warmup_steps 2000",
                 "refcoco+_unc": "--warmup_steps 500"}),
}

# model -> concap pretraining flags (reference: examples/*/concap/train.sh)
CONCAP = {
    "ctrl_uniter": "--train_batch_size 256 --max_seq_length 38 "
                   "--learning_rate 1e-4 --weight_decay 0.01 "
                   "--warmup_proportion 0.1 --clip_grad_norm 5.0 "
                   "--objective 1 --num_train_epochs 10",
    "vilbert": "--train_batch_size 512 --max_seq_length 36 "
               "--learning_rate 1e-4 --weight_decay 0.01 "
               "--warmup_proportion 0.1 --clip_grad_norm 0.0 "
               "--objective 1 --num_train_epochs 10",
    "lxmert": "--train_batch_size 256 --max_seq_length 20 "
              "--learning_rate 1e-4 --weight_decay 0.01 "
              "--warmup_proportion 0.05 --clip_grad_norm 1.0 "
              "--objective 1 --num_train_epochs 20",
    "vl-bert": "--train_batch_size 256 --max_seq_length 25 "
               "--learning_rate 256e-7 --weight_decay 0.0001 "
               "--warmup_steps 8000 --clip_grad_norm 10.0 "
               "--objective 2 --num_train_epochs 10",
}
for _m in ("ctrl_vilbert", "ctrl_visualbert", "ctrl_vl-bert", "ctrl_lxmert"):
    CONCAP[_m] = CONCAP["ctrl_uniter"]

TRAIN_SH = """#!/bin/bash
# {model} x {task_name} fine-tuning
# (hyperparameters per reference examples/{model}/{task_dir}/train.sh)

TASK={task_id}
MODEL={config}
TASKS_CONFIG={prefix}_trainval_tasks
PRETRAINED=checkpoints/conceptual_captions/{model}/${{MODEL}}/best

python train_task.py \\
  --bert_model bert-base-uncased --config_file configs/${{MODEL}}.json \\
  --from_pretrained ${{PRETRAINED}} \\
  --tasks_config_file config_tasks/${{TASKS_CONFIG}}.yml --task $TASK \\
  {flags} \\
  --output_dir checkpoints/{task_dir}/{model} \\
  --logdir logs/{task_dir}
#  --resume_file checkpoints/{task_dir}/{model}/{task_name}_${{MODEL}}/ckpt
"""

TEST_SH = """#!/bin/bash
# {model} x {task_name} test-split evaluation

TASK={task_id}
MODEL={config}
TASKS_CONFIG={prefix}_test_tasks
PRETRAINED=checkpoints/{task_dir}/{model}/{task_name}_${{MODEL}}/best

python {eval_entry} \\
  --bert_model bert-base-uncased --config_file configs/${{MODEL}}.json \\
  --from_pretrained ${{PRETRAINED}} \\
  --tasks_config_file config_tasks/${{TASKS_CONFIG}}.yml --task $TASK \\
  {split}--output_dir results/{task_dir}/{model}
"""

CONCAP_SH = """#!/bin/bash
# {model} Conceptual Captions pretraining
# (hyperparameters per reference examples/{model}/concap/train.sh)

MODEL={config}
ANNOS=datasets/conceptual_caption/annotations
FEATS=datasets/conceptual_caption/imgfeats/volta

python train_concap.py \\
  --bert_model bert-base-uncased --config_file configs/${{MODEL}}.json \\
  --annotations_path $ANNOS --features_path $FEATS \\
  --adam_epsilon 1e-6 --adam_betas 0.9 0.999 \\
  {flags} \\
  --gradient_accumulation_steps 1 --in_memory True \\
  --output_dir checkpoints/conceptual_captions/{model} \\
  --logdir logs/concap
#  --resume_file checkpoints/conceptual_captions/{model}/${{MODEL}}/ckpt
"""


def write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)
    os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR | stat.S_IXGRP)


def main():
    if os.path.isdir(ROOT):
        shutil.rmtree(ROOT)
    count = 0
    for model, (config, prefix, flags, tasks, overrides) in MODELS.items():
        write(os.path.join(ROOT, model, "concap", "train.sh"),
              CONCAP_SH.format(model=model, config=config,
                               flags=CONCAP[model]))
        count += 1
        for td in tasks:
            task_id, task_name, eval_entry = TASKS[td]
            tflags = flags
            if td in overrides:
                tflags = f"{flags} {overrides[td]}"
            write(os.path.join(ROOT, model, td, "train.sh"),
                  TRAIN_SH.format(model=model, config=config, prefix=prefix,
                                  task_id=task_id, task_name=task_name,
                                  task_dir=td, flags=tflags))
            split = "--split test " if eval_entry == "eval_retrieval.py" \
                else ""
            write(os.path.join(ROOT, model, td, "test.sh"),
                  TEST_SH.format(model=model, config=config, prefix=prefix,
                                 task_id=task_id, task_name=task_name,
                                 task_dir=td, eval_entry=eval_entry,
                                 split=split))
            count += 2
    print(f"wrote {count} scripts under {ROOT}")


if __name__ == "__main__":
    main()
