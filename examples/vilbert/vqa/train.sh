#!/bin/bash
# vilbert x VQA fine-tuning
# (hyperparameters per reference examples/vilbert/vqa/train.sh)

TASK=1
MODEL=vilbert_base
TASKS_CONFIG=vilbert_trainval_tasks
PRETRAINED=checkpoints/conceptual_captions/vilbert/${MODEL}/best

python train_task.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/${TASKS_CONFIG}.yml --task $TASK \
  --adam_epsilon 1e-6 --adam_betas 0.9 0.999 --weight_decay 0.01 --warmup_proportion 0.1 --clip_grad_norm 0.0 \
  --output_dir checkpoints/vqa/vilbert \
  --logdir logs/vqa
#  --resume_file checkpoints/vqa/vilbert/VQA_${MODEL}/ckpt
