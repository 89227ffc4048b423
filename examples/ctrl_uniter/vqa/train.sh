#!/bin/bash
# ctrl_uniter x VQA fine-tuning
# (hyperparameters per reference examples/ctrl_uniter/vqa/train.sh)

TASK=1
MODEL=ctrl_uniter_base
TASKS_CONFIG=ctrl_trainval_tasks
PRETRAINED=checkpoints/conceptual_captions/ctrl_uniter/${MODEL}/best

python train_task.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/${TASKS_CONFIG}.yml --task $TASK \
  --adam_epsilon 1e-6 --adam_betas 0.9 0.999 --adam_correct_bias --weight_decay 0.0001 --warmup_proportion 0.1 --clip_grad_norm 1.0 \
  --output_dir checkpoints/vqa/ctrl_uniter \
  --logdir logs/vqa
#  --resume_file checkpoints/vqa/ctrl_uniter/VQA_${MODEL}/ckpt
