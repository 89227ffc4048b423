#!/bin/bash
# Round-4c hardware batch (one TPU process at a time): the VERDICT r3
# item-7 MFU experiment, two bounded probes:
#   1. Pallas fused matmul+tanh-gelu FFN kernel vs XLA at the exact
#      headline FFN shapes (decision probe before any model integration)
#   2. compiler_options grid: the unprobed scheduler/fusion knobs,
#      tiny-accept stage then full-step A/B for accepted ones
set -u
cd /root/repo
mkdir -p logs

echo "=== pallas FFN epilogue probe ($(date))"
python -u tools/pallas_ffn_probe.py \
  > logs/pallas_ffn_probe_r4.log 2>&1 || true
tail -5 logs/pallas_ffn_probe_r4.log

echo "=== compiler options grid ($(date))"
python -u tools/probe_compiler_options.py --full --iters 20 \
  > logs/compopts_r4.log 2>&1 || true
tail -8 logs/compopts_r4.log

echo "=== ALLDONE r4c ($(date))"
