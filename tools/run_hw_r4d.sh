#!/bin/bash
# Round-4d hardware batch: complete the serving batch ladder for int8
# (dynamic) vs bf16 — the weight-traffic-bound region (small batches) is
# where int8's 2x-smaller weights pay; b64 already measured +28%.
#   int8:  b1, b8, b128, b256
#   bf16:  b128, b256  (ladder so far: b1 108/s, b8 5223, b64 11139,
#                       b1024 10427 — logs/bench_serving_latency_r3.log)
set -u
cd /root/repo
mkdir -p logs
LOG=logs/bench_serving_ladder_r4.log
: > $LOG

for b in 1 8 128 256; do
  echo "=== int8 b$b ($(date))" | tee -a $LOG
  python -u tools/export_model.py \
    --config_file configs/ctrl_uniter_base.json \
    --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
    --out /tmp/vqa_int8_b$b.stablehlo --batch_size $b --use_pallas \
    --quantize int8 --check --bench 100 \
    >> $LOG 2>&1 || true
  tail -1 $LOG
done

for b in 128 256; do
  echo "=== bf16 b$b ($(date))" | tee -a $LOG
  python -u tools/export_model.py \
    --config_file configs/ctrl_uniter_base.json \
    --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
    --out /tmp/vqa_bf16_b$b.stablehlo --batch_size $b --use_pallas \
    --check --bench 100 \
    >> $LOG 2>&1 || true
  tail -1 $LOG
done

echo "=== ALLDONE r4d ($(date))"
