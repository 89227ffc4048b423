#!/bin/bash
MODEL=ctrl_lxmert
PRETRAINED=checkpoints/conceptual_captions/${MODEL}/pytorch_model_9.bin

python train_task.py \
  --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/all_tasks.yml --task 1 \
  --vocab_file vocab/bert-base-uncased-vocab.txt \
  --adam_epsilon 1e-6 --weight_decay 0.01 --clip_grad_norm 0.0 \
  --warmup_proportion 0.1 --num_train_epochs 20 \
  --output_dir save/vqa_${MODEL} --logdir logs/vqa_${MODEL}
