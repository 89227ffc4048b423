#!/bin/bash
# Round-3h hardware batch (queued behind the TPU outage; supersedes
# run_hw_r3f.sh). One TPU process at a time, run under nohup. Items:
#   1. kernel validation + headline bench, device-only AND loader-in-loop —
#      first hardware measurement of the narrowed store wire
#      (int16 tokens / int8 masks, question_id off the wire)
#   2. CC pretraining loader-in-loop (kl + the outage-truncated nce row)
#      at the narrowed wire
#   3. the pending int8 batch (roofline probe + b1024/b64 serving bench)
#   4. ctrl_lxmert step trace (where do its 53.9%-MFU losses live?)
set -u
cd /root/repo
mkdir -p logs

echo "=== bench: validate + device-only + loader-in-loop ($(date))"
python -u bench.py --validate --data_steps 150 \
  > logs/bench_r3h.log 2>&1 || true

echo "=== CC loader-in-loop kl+nce b512 ($(date))"
python -u tools/bench_pretrain.py --data .synth/cc \
  --targets kl nce --device_store \
  > logs/bench_pretrain_r3h.log 2>&1 || true

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
