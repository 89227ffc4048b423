#!/bin/bash
# ctrl_vl-bert x refcoco+ test-split evaluation

TASK=10
MODEL=ctrl_vl-bert_base
TASKS_CONFIG=ctrl_test_tasks
PRETRAINED=checkpoints/refcoco+_unc/ctrl_vl-bert/refcoco+_${MODEL}/best

python eval_task.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/${TASKS_CONFIG}.yml --task $TASK \
  --output_dir results/refcoco+_unc/ctrl_vl-bert
