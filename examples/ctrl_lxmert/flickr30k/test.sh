#!/bin/bash
# ctrl_lxmert x RetrievalFlickr30k test-split evaluation

TASK=8
MODEL=ctrl_lxmert
TASKS_CONFIG=ctrl_test_tasks
PRETRAINED=checkpoints/flickr30k/ctrl_lxmert/RetrievalFlickr30k_${MODEL}/best

python eval_retrieval.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/${TASKS_CONFIG}.yml --task $TASK \
  --split test --output_dir results/flickr30k/ctrl_lxmert
