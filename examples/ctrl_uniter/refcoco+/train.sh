#!/bin/bash
MODEL=ctrl_uniter_base
python train_task.py \
  --config_file configs/${MODEL}.json \
  --from_pretrained checkpoints/conceptual_captions/${MODEL}/pytorch_model_9.bin \
  --tasks_config_file config_tasks/all_tasks.yml --task 10 \
  --vocab_file vocab/bert-base-uncased-vocab.txt \
  --output_dir save/refcoco+_${MODEL} --logdir logs/refcoco+_${MODEL}
