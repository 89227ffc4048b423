#!/bin/bash
# vl-bert Conceptual Captions pretraining
# (hyperparameters per reference examples/vl-bert/concap/train.sh)

MODEL=vl-bert_base
ANNOS=datasets/conceptual_caption/annotations
FEATS=datasets/conceptual_caption/imgfeats/volta

python train_concap.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --annotations_path $ANNOS --features_path $FEATS \
  --adam_epsilon 1e-6 --adam_betas 0.9 0.999 \
  --train_batch_size 256 --max_seq_length 25 --learning_rate 256e-7 --weight_decay 0.0001 --warmup_steps 8000 --clip_grad_norm 10.0 --objective 2 --num_train_epochs 10 \
  --gradient_accumulation_steps 1 --in_memory True \
  --output_dir checkpoints/conceptual_captions/vl-bert \
  --logdir logs/concap
#  --resume_file checkpoints/conceptual_captions/vl-bert/${MODEL}/ckpt
