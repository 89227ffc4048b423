#!/bin/bash
# Round-5 hardware batch C: NCE perf fix A/B (VERDICT r5 #2 tail).
# Before (r5b, old code): nce 1760.0 pairs/s, 290.9 ms/step vs kl 212.
#   1. nce dense path with input-dtype (bf16) score matmuls
#   2. nce blockwise scan at chunk 4096 (same dtype fix)
#   3. trace of the dense path for the decomposition table
set -u
cd /root/repo
SYNTH=${SYNTH:-/root/repo/.synth}
mkdir -p logs

echo "=== nce dense, bf16 matmuls + f32 scores (A/B control) ($(date))"
python -u tools/bench_pretrain.py --data "$SYNTH/cc" --targets nce \
  --steps 30 --skip_loader --device_store --nce_score_f32 \
  > logs/bench_nce_bf16mm_f32s_r5c.log 2>&1
grep device-only logs/bench_nce_bf16mm_f32s_r5c.log

echo "=== nce dense, bf16 matmuls + bf16 scores ($(date))"
python -u tools/bench_pretrain.py --data "$SYNTH/cc" --targets nce \
  --steps 30 --skip_loader --device_store \
  > logs/bench_nce_bf16_r5c.log 2>&1
grep device-only logs/bench_nce_bf16_r5c.log

echo "=== nce blockwise chunk 4096 ($(date))"
python -u tools/bench_pretrain.py --data "$SYNTH/cc" --targets nce \
  --steps 30 --skip_loader --device_store --nce_chunk 4096 \
  > logs/bench_nce_chunk_r5c.log 2>&1
grep device-only logs/bench_nce_chunk_r5c.log

echo "=== nce dense trace ($(date))"
python -u tools/bench_pretrain.py --data "$SYNTH/cc" --targets nce \
  --steps 20 --skip_loader --trace /tmp/trace_cc_nce_r5c \
  > logs/bench_nce_trace_r5c.log 2>&1
python tools/analyze_trace.py /tmp/trace_cc_nce_r5c \
  > logs/trace_cc_nce_r5c_analysis.log 2>&1 || true
head -20 logs/trace_cc_nce_r5c_analysis.log

echo "=== DONE r5c ($(date))"
