#!/bin/bash
# Round-4b hardware batch: the roberta device-only step bench that r4a
# lost to the tokenizer-dispatch bug (bench_task_step now takes
# --bert_model so the BPE tokenizer is selected for the vocab dir).
set -u
cd /root/repo
mkdir -p logs

echo "=== roberta device-only step bench ($(date))"
python -u tools/bench_task_step.py \
  --config_file /tmp/volta_synth_vqa/roberta_uniter.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --bert_model roberta-base \
  --vocab_file /tmp/volta_synth_vqa/roberta_vocab \
  > logs/bench_roberta_step_r4.log 2>&1 || true
tail -3 logs/bench_roberta_step_r4.log

echo "=== ALLDONE r4b ($(date))"
