#!/bin/bash
# Round-5 hardware batch D: shared-cross-batch-negative NCE
# (--nce_shared_negatives, opt-in: removes the all-pairs matmul + giant
# gather; see losses._NCE_SHARED_NEGATIVES). A/B vs the parity-sampled
# dense path (290.9 ms) + trace. Also: end-of-round validate+bench.
set -u
cd /root/repo
SYNTH=${SYNTH:-/root/repo/.synth}
mkdir -p logs

echo "=== nce shared negatives ($(date))"
python -u tools/bench_pretrain.py --data "$SYNTH/cc" --targets nce \
  --steps 30 --skip_loader --device_store --nce_shared_negatives \
  > logs/bench_nce_shared_r5d.log 2>&1
grep device-only logs/bench_nce_shared_r5d.log

echo "=== nce shared trace ($(date))"
python -u tools/bench_pretrain.py --data "$SYNTH/cc" --targets nce \
  --steps 20 --skip_loader --nce_shared_negatives \
  --trace /tmp/trace_cc_nce_r5d > logs/bench_nce_shared_trace_r5d.log 2>&1
python tools/analyze_trace.py /tmp/trace_cc_nce_r5d \
  > logs/trace_cc_nce_r5d_analysis.log 2>&1 || true
head -12 logs/trace_cc_nce_r5d_analysis.log

echo "=== end-of-round validate + bench ($(date))"
python -u bench.py --validate > logs/bench_r5_final.log 2>&1
tail -3 logs/bench_r5_final.log

echo "=== DONE r5d ($(date))"
