#!/bin/bash
# ctrl_visualbert Conceptual Captions pretraining
# (hyperparameters per reference examples/ctrl_visualbert/concap/train.sh)

MODEL=ctrl_visualbert_base
ANNOS=datasets/conceptual_caption/annotations
FEATS=datasets/conceptual_caption/imgfeats/volta

python train_concap.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --annotations_path $ANNOS --features_path $FEATS \
  --adam_epsilon 1e-6 --adam_betas 0.9 0.999 \
  --train_batch_size 256 --max_seq_length 38 --learning_rate 1e-4 --weight_decay 0.01 --warmup_proportion 0.1 --clip_grad_norm 5.0 --objective 1 --num_train_epochs 10 \
  --gradient_accumulation_steps 1 --in_memory True \
  --output_dir checkpoints/conceptual_captions/ctrl_visualbert \
  --logdir logs/concap
#  --resume_file checkpoints/conceptual_captions/ctrl_visualbert/${MODEL}/ckpt
