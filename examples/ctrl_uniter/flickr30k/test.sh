#!/bin/bash
MODEL=ctrl_uniter_base
python eval_retrieval.py \
  --config_file configs/${MODEL}.json \
  --from_pretrained save/RetrievalFlickr30k_${MODEL}/*/best \
  --tasks_config_file config_tasks/all_tasks.yml --task 8 --split test \
  --vocab_file vocab/bert-base-uncased-vocab.txt \
  --output_dir results/RetrievalFlickr30k_${MODEL}
