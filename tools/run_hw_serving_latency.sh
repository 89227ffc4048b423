#!/bin/bash
# Serving latency ladder: ms/call of the exported VQA task forward at
# small batch sizes (the b1024 throughput point lives in
# logs/bench_serving_r3e2.log). One TPU process at a time.
set -u
cd /root/repo
for B in 1 8 64; do
  echo "=== serving export+bench b$B ($(date))"
  python -u tools/export_model.py \
    --config_file configs/ctrl_uniter_base.json \
    --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
    --out /tmp/vqa_tpu_b$B.stablehlo --batch_size $B \
    --use_pallas --platforms tpu --check --bench 50
done
echo "=== done ($(date))"
