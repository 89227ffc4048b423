#!/bin/bash
# ctrl_uniter x NLVR2 fine-tuning
# (hyperparameters per reference examples/ctrl_uniter/nlvr2/train.sh)

TASK=12
MODEL=ctrl_uniter_base
TASKS_CONFIG=ctrl_trainval_tasks
PRETRAINED=checkpoints/conceptual_captions/ctrl_uniter/${MODEL}/best

python train_task.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/${TASKS_CONFIG}.yml --task $TASK \
  --adam_epsilon 1e-6 --adam_betas 0.9 0.999 --adam_correct_bias --weight_decay 0.0001 --warmup_proportion 0.1 --clip_grad_norm 1.0 \
  --output_dir checkpoints/nlvr2/ctrl_uniter \
  --logdir logs/nlvr2
#  --resume_file checkpoints/nlvr2/ctrl_uniter/NLVR2_${MODEL}/ckpt
