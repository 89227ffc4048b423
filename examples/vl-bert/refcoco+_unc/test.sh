#!/bin/bash
# vl-bert x refcoco+ test-split evaluation

TASK=10
MODEL=vl-bert_base
TASKS_CONFIG=vl-bert_test_tasks
PRETRAINED=checkpoints/refcoco+_unc/vl-bert/refcoco+_${MODEL}/best

python eval_task.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/${TASKS_CONFIG}.yml --task $TASK \
  --output_dir results/refcoco+_unc/vl-bert
