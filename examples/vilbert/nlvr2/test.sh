#!/bin/bash
# vilbert x NLVR2 test-split evaluation

TASK=12
MODEL=vilbert_base
TASKS_CONFIG=vilbert_test_tasks
PRETRAINED=checkpoints/nlvr2/vilbert/NLVR2_${MODEL}/best

python eval_task.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/${TASKS_CONFIG}.yml --task $TASK \
  --output_dir results/nlvr2/vilbert
