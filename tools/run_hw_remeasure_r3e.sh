#!/bin/bash
# Round-3e re-measurement batch at the tanh-gelu default: fresh trace,
# all model families, CC five objectives, eval forward, serving,
# retrieval, VCR/NLVR2 (device-only + loader-in-loop), b512 VQA.
# One TPU process at a time — strictly sequential. Synth corpora are
# assumed present (tools/run_hw_remeasure_r3.sh and run_hw_vcr/nlvr2.sh
# generate them).
set -eu
cd /root/repo
mkdir -p logs

if [ ! -s logs/trace_r3g_analysis.log ]; then
  echo "=== trace at tanh-gelu default ($(date))"
  python -u tools/perf_probe.py --variants base --iters 30 \
    --trace /tmp/trace_r3g > logs/perf_probe_r3g.log 2>&1
  python tools/analyze_trace.py /tmp/trace_r3g \
    > logs/trace_r3g_analysis.log 2>&1 || true
fi

for cfg in ctrl_vilbert_base ctrl_lxmert ctrl_visualbert_base \
           ctrl_vl-bert_base; do
  grep -q pairs/sec "logs/bench_${cfg}_r3e.log" 2>/dev/null && continue
  echo "=== ${cfg} VQA step ($(date))"
  python -u tools/bench_task_step.py \
    --config_file configs/${cfg}.json \
    --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
    --vocab_file /tmp/volta_synth_vqa/vocab.txt \
    > logs/bench_${cfg}_r3e.log 2>&1
done

grep -q pairs/sec logs/bench_vqa_b512_r3e.log 2>/dev/null || {
echo "=== b512 VQA step ($(date))"
python -u tools/bench_task_step.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks_b512.yml --task 1 \
  --vocab_file /tmp/volta_synth_vqa/vocab.txt \
  > logs/bench_vqa_b512_r3e.log 2>&1
}

grep -q "nce, device-only" logs/bench_pretrain_r3e.log 2>/dev/null || {
echo "=== CC pretraining 5 objectives, device store ($(date))"
python -u tools/bench_pretrain.py --data .synth/cc \
  --targets kl mse huber xobj nce --steps 30 --loader_steps 15 \
  --device_store >> logs/bench_pretrain_r3e.log 2>&1
}

grep -q ms_per_call logs/bench_evalfwd_r3e.log 2>/dev/null || {
echo "=== eval forward b1024 ($(date))"
python -u tools/bench_eval_forward.py > logs/bench_evalfwd_r3e.log 2>&1
}

echo "=== serving export + bench ($(date))"
python -u tools/export_model.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --out /tmp/vqa_tpu.stablehlo --batch_size 1024 --use_pallas --check --bench 30 \
  > logs/bench_serving_r3e.log 2>&1

echo "=== retrieval eval, 1000-image gallery, cb8 ($(date))"
python -u eval_retrieval.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file .synth/retrieval/tasks.yml --task 8 \
  --vocab_file .synth/retrieval/vocab.txt --split test \
  --captions_per_forward 8 --output_dir /tmp/retr_r3e \
  > logs/bench_retrieval_r3e.log 2>&1

echo "=== VCR device-only ($(date))"
python -u tools/bench_task_step.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file .synth/vcr/tasks.yml --task 5 \
  --vocab_file .synth/vcr/vocab.txt > logs/bench_vcr_r3e.log 2>&1
echo "=== VCR loader-in-loop ($(date))"
python -u tools/bench_task_step.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file .synth/vcr/tasks.yml --task 5 \
  --vocab_file .synth/vcr/vocab.txt --with_data \
  > logs/bench_vcr_r3e_data.log 2>&1

echo "=== NLVR2 device-only ($(date))"
python -u tools/bench_task_step.py \
  --config_file configs/ctrl_vilbert_base.json \
  --tasks_config_file .synth/nlvr2/tasks.yml --task 12 \
  --vocab_file .synth/nlvr2/vocab.txt > logs/bench_nlvr2_r3e.log 2>&1
echo "=== NLVR2 loader-in-loop ($(date))"
python -u tools/bench_task_step.py \
  --config_file configs/ctrl_vilbert_base.json \
  --tasks_config_file .synth/nlvr2/tasks.yml --task 12 \
  --vocab_file .synth/nlvr2/vocab.txt --with_data \
  > logs/bench_nlvr2_r3e_data.log 2>&1

echo "=== ALLDONE ($(date))"
