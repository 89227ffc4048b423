#!/bin/bash
# vilbert x RetrievalCOCO test-split evaluation

TASK=7
MODEL=vilbert_base
TASKS_CONFIG=vilbert_test_tasks
PRETRAINED=checkpoints/mscoco/vilbert/RetrievalCOCO_${MODEL}/best

python eval_retrieval.py \
  --bert_model bert-base-uncased --config_file configs/${MODEL}.json \
  --from_pretrained ${PRETRAINED} \
  --tasks_config_file config_tasks/${TASKS_CONFIG}.yml --task $TASK \
  --split test --output_dir results/mscoco/vilbert
