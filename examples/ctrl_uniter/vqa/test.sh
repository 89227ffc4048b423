#!/bin/bash
MODEL=ctrl_uniter_base
python eval_task.py \
  --config_file configs/${MODEL}.json \
  --from_pretrained save/VQA_${MODEL}/VQA_${MODEL}.json-base/best \
  --tasks_config_file config_tasks/all_tasks.yml --task 1 --split test \
  --vocab_file vocab/bert-base-uncased-vocab.txt \
  --output_dir results/VQA_${MODEL}
