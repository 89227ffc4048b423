#!/bin/bash
MODEL=ctrl_vilbert_base
python train_concap.py \
  --config_file configs/${MODEL}.json \
  --from_pretrained bert-base-uncased.bin \
  --vocab_file vocab/bert-base-uncased-vocab.txt \
  --annotations_path datasets/conceptual_caption/annotations \
  --features_path datasets/conceptual_caption/imgfeats/volta \
  --train_batch_size 512 --learning_rate 1e-4 --num_train_epochs 10 \
  --objective 1 --max_seq_length 36 \
  --output_dir checkpoints/conceptual_captions/${MODEL} \
  --logdir logs/conceptual_captions/${MODEL}
