#!/bin/bash
# Round-3q follow-up batch (runs after r3o releases the TPU):
#   1. int8 serving throughput b1024/b64 — re-run of the r3o items that
#      failed before tools/export_model.py defaulted --use_pallas exports
#      to platforms=('tpu',)
#   2. RoBERTa fine-tune smoke on hardware (full-dims roberta-flagged
#      ctrl_uniter, byte-level BPE tokenizer, 1 epoch + val)
set -u
cd /root/repo
mkdir -p logs

for i in $(seq 1 720); do
  grep -q "ALLDONE r3o" logs/run_hw_r3o.log 2>/dev/null && break
  # fail fast if the r3o log never appears at all (mis-invocation:
  # run_hw_r3o.sh relies on the caller redirecting stdout there)
  [ $i -gt 10 ] && [ ! -f logs/run_hw_r3o.log ] && {
    echo "logs/run_hw_r3o.log absent; r3o not running - aborting r3q"; exit 1; }
  sleep 30
done
grep -q "ALLDONE r3o" logs/run_hw_r3o.log || {
  echo "r3o never finished; aborting r3q"; exit 1; }

echo "=== int8 serving b1024 ($(date))"
python -u tools/export_model.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --out /tmp/vqa_int8.stablehlo --batch_size 1024 --use_pallas \
  --quantize int8 --check --bench 30 \
  >> logs/bench_serving_int8_r3.log 2>&1 || true

echo "=== int8 serving b64 ($(date))"
python -u tools/export_model.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --out /tmp/vqa_int8_b64.stablehlo --batch_size 64 --use_pallas \
  --quantize int8 --check --bench 100 \
  >> logs/bench_serving_int8_r3.log 2>&1 || true

PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF'
import sys
sys.path.insert(0, "tools")
from accuracy_proxies import make_roberta_vocab
from volta_tpu import zoo

d, vs = make_roberta_vocab("/tmp/volta_synth_vqa")
cfg = zoo.build("ctrl_uniter_base", model="roberta", vocab_size=vs + 3)
open("/tmp/volta_synth_vqa/roberta_uniter.json", "w").write(
    cfg.to_json_string())
EOF

echo "=== roberta VQA fine-tune smoke on TPU ($(date))"
python -u train_task.py \
  --config_file /tmp/volta_synth_vqa/roberta_uniter.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --bert_model roberta-base \
  --vocab_file /tmp/volta_synth_vqa/roberta_vocab \
  --output_dir /tmp/roberta_smoke_save --logdir /tmp/roberta_smoke_logs \
  --num_train_epochs 1 --num_workers 2 --in_memory True \
  > logs/hw_roberta_r3.log 2>&1 || true
grep -E "VAL epoch|pairs/s" logs/hw_roberta_r3.log | tail -3
echo "=== ALLDONE r3q ($(date))"
