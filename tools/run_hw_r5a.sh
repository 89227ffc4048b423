#!/bin/bash
# Round-5 hardware batch A: the fused dual-stream chapter (VERDICT r5 #1).
#   1. kernel validation (incl. the new TP-seed A/B check 2c)
#   2. lxmert + vilbert b256 VQA steps, fused vs unfused A/B
#   3. trace of the fused lxmert step (elementwise share vs the 15.6 ms
#      round-4 baseline)
#   4. single-stream regression guard (uniter b256 — fusion must not
#      touch the single-stream path)
# One TPU process at a time — strictly sequential. Synth data assumed
# present (/tmp/volta_synth_vqa, tools/run_hw_remeasure_r3.sh makes it).
set -u
cd /root/repo
mkdir -p logs

echo "=== validate_tpu ($(date))"
python -u tools/validate_tpu.py > logs/hw_validate_r5a.log 2>&1
tail -2 logs/hw_validate_r5a.log

for cfg in ctrl_lxmert ctrl_vilbert_base; do
  echo "=== ${cfg} fused dual-stream ($(date))"
  python -u tools/bench_task_step.py \
    --config_file configs/${cfg}.json \
    --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
    --vocab_file /tmp/volta_synth_vqa/vocab.txt \
    > logs/bench_${cfg}_fused_r5a.log 2>&1
  grep pairs/sec logs/bench_${cfg}_fused_r5a.log
  echo "=== ${cfg} unfused (A/B control) ($(date))"
  python -u tools/bench_task_step.py \
    --config_file configs/${cfg}.json \
    --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
    --vocab_file /tmp/volta_synth_vqa/vocab.txt \
    --set fuse_dual_stream=false \
    > logs/bench_${cfg}_unfused_r5a.log 2>&1
  grep pairs/sec logs/bench_${cfg}_unfused_r5a.log
done

echo "=== lxmert fused trace ($(date))"
python -u tools/bench_task_step.py \
  --config_file configs/ctrl_lxmert.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --vocab_file /tmp/volta_synth_vqa/vocab.txt \
  --trace /tmp/trace_lxmert_r5a \
  > logs/bench_lxmert_trace_r5a.log 2>&1
python tools/analyze_trace.py /tmp/trace_lxmert_r5a \
  > logs/trace_lxmert_r5a_analysis.log 2>&1 || true
tail -20 logs/trace_lxmert_r5a_analysis.log

echo "=== uniter single-stream regression guard ($(date))"
python -u tools/bench_task_step.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --vocab_file /tmp/volta_synth_vqa/vocab.txt \
  > logs/bench_uniter_guard_r5a.log 2>&1
grep pairs/sec logs/bench_uniter_guard_r5a.log

echo "=== DONE r5a ($(date))"
