#!/bin/bash
# ctrl_lxmert x RetrievalFlickr30k fine-tuning
# (hyperparameters per reference examples/ctrl_lxmert/flickr30k/train.sh)

TASK=8
MODEL=ctrl_lxmert
TASKS_CONFIG=ctrl_trainval_tasks
PRETRAINED=checkpoints/conceptual_captions/ctrl_lxmert/${MODEL}/best

python train_task.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/${TASKS_CONFIG}.yml --task $TASK \
  --adam_epsilon 1e-6 --adam_betas 0.9 0.999 --adam_correct_bias --weight_decay 0.0001 --warmup_proportion 0.1 --clip_grad_norm 1.0 \
  --output_dir checkpoints/flickr30k/ctrl_lxmert \
  --logdir logs/flickr30k
#  --resume_file checkpoints/flickr30k/ctrl_lxmert/RetrievalFlickr30k_${MODEL}/ckpt
