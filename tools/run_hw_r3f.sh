#!/bin/bash
# Round-3f hardware batch (queued behind the TPU outage). One TPU process
# at a time. Items:
#   1. NCE loader-in-loop at the tanh-gelu default (the one row the outage
#      truncated out of logs/bench_pretrain_inloop_r3.log)
#   2. int8 serving batch (roofline probe + b1024/b64 artifact bench)
#   3. ctrl_lxmert step trace (where do its 53.9%-MFU losses live?)
set -eu
cd /root/repo
mkdir -p logs

echo "=== NCE loader-in-loop ($(date))"
python -u tools/bench_pretrain.py --data .synth/cc \
  --targets nce --device_store \
  > logs/bench_pretrain_nce_inloop_r3f.log 2>&1 || true

echo "=== int8 roofline ($(date))"
python -u tools/int8_roofline.py > logs/int8_roofline_r3.log 2>&1 || true

echo "=== int8 serving b1024 ($(date))"
python -u tools/export_model.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --out /tmp/vqa_int8.stablehlo --batch_size 1024 --use_pallas \
  --quantize int8 --check --bench 30 \
  > logs/bench_serving_int8_r3.log 2>&1 || true

echo "=== int8 serving b64 ($(date))"
python -u tools/export_model.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --out /tmp/vqa_int8_b64.stablehlo --batch_size 64 --use_pallas \
  --quantize int8 --check --bench 100 \
  >> logs/bench_serving_int8_r3.log 2>&1 || true

echo "=== lxmert trace ($(date))"
python -u tools/bench_task_step.py \
  --config_file configs/ctrl_lxmert.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --vocab_file /tmp/volta_synth_vqa/vocab.txt \
  --trace /tmp/trace_lxmert_r3 > logs/bench_lxmert_trace_r3.log 2>&1 || true
python tools/analyze_trace.py /tmp/trace_lxmert_r3 \
  > logs/trace_lxmert_analysis_r3.log 2>&1 || true

echo "=== ALLDONE ($(date))"
