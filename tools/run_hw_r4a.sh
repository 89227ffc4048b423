#!/bin/bash
# Round-4a hardware batch (one TPU process at a time):
#   1. finish the stranded int8 dynamic b64 leg (check + bench) —
#      r3q exported the artifact but the round ended before the bench
#   2. int8_static (calibrated activation scales, fused requant) at
#      b1024 and b64 vs the bf16 ladder (10,427 / 11,139 samples/s)
#   3. clean RoBERTa device-only step bench (the r3q smoke ran
#      loader-in-loop over the tunnel; this isolates the chip rate)
set -u
cd /root/repo
mkdir -p logs

echo "=== int8 dynamic b64 check+bench ($(date))"
python -u tools/export_model.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --out /tmp/vqa_int8_b64.stablehlo --batch_size 64 --use_pallas \
  --quantize int8 --check --bench 100 \
  > logs/bench_serving_int8_b64_r4.log 2>&1 || true
tail -3 logs/bench_serving_int8_b64_r4.log

echo "=== int8_static b1024 ($(date))"
python -u tools/export_model.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --out /tmp/vqa_int8s.stablehlo --batch_size 1024 --use_pallas \
  --quantize int8_static --check --bench 30 \
  > logs/bench_serving_int8s_r4.log 2>&1 || true
tail -3 logs/bench_serving_int8s_r4.log

echo "=== int8_static b64 ($(date))"
python -u tools/export_model.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --out /tmp/vqa_int8s_b64.stablehlo --batch_size 64 --use_pallas \
  --quantize int8_static --check --bench 100 \
  >> logs/bench_serving_int8s_r4.log 2>&1 || true
tail -3 logs/bench_serving_int8s_r4.log

echo "=== roberta device-only step bench ($(date))"
python -u tools/bench_task_step.py \
  --config_file /tmp/volta_synth_vqa/roberta_uniter.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --vocab_file /tmp/volta_synth_vqa/roberta_vocab \
  > logs/bench_roberta_step_r4.log 2>&1 || true
tail -3 logs/bench_roberta_step_r4.log

echo "=== ALLDONE r4a ($(date))"
