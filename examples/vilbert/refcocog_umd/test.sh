#!/bin/bash
# vilbert x refcocog test-split evaluation

TASK=11
MODEL=vilbert_base
TASKS_CONFIG=vilbert_test_tasks
PRETRAINED=checkpoints/refcocog_umd/vilbert/refcocog_${MODEL}/best

python eval_task.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/${TASKS_CONFIG}.yml --task $TASK \
  --output_dir results/refcocog_umd/vilbert
