#!/bin/bash
# vilbert x GQA test-split evaluation

TASK=15
MODEL=vilbert_base
TASKS_CONFIG=vilbert_test_tasks
PRETRAINED=checkpoints/gqa/vilbert/GQA_${MODEL}/best

python eval_task.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/${TASKS_CONFIG}.yml --task $TASK \
  --output_dir results/gqa/vilbert
