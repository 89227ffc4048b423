#!/bin/bash
# Round-3i hardware batch: the queued r3h items plus the extended
# compiler-options stage-1 probe. One TPU process at a time; run under
# nohup and poll the logs.
set -u
cd /root/repo
bash tools/run_hw_r3h.sh
echo "=== compiler-options stage-1 probe ($(date))"
python -u tools/probe_compiler_options.py > logs/compopts_tiny_r3i.log 2>&1 || true
echo "=== loader-in-loop prefetch A/B ($(date))"
python -u bench.py --skip_validate --prefetch 1 --data_steps 150 \
  > logs/bench_prefetch_r3i.log 2>&1 || true
echo "=== ALLDONE r3i ($(date))"
