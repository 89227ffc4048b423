#!/bin/bash
# ctrl_vilbert x VQA test-split evaluation

TASK=1
MODEL=ctrl_vilbert_base
TASKS_CONFIG=ctrl_test_tasks
PRETRAINED=checkpoints/vqa/ctrl_vilbert/VQA_${MODEL}/best

python eval_task.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/${TASKS_CONFIG}.yml --task $TASK \
  --output_dir results/vqa/ctrl_vilbert
