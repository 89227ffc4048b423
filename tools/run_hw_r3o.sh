#!/bin/bash
# Round-3o hardware batch (fresh host: /tmp and .synth wiped between
# sessions). Regenerates the synth corpora CPU-side, then runs the
# still-pending r3h/r3i measurements in priority order:
#   1. headline bench: kernel validation + device-only + loader-in-loop
#   2. int8 serving throughput b1024/b64 (STATUS.md "pending")
#   3. loader-in-loop prefetch A/B (--prefetch 1)
#   4. CC pretraining loader-in-loop kl+nce at the narrowed wire
#   5. int8 roofline probe + ctrl_lxmert step trace (investigative)
# One TPU process at a time - strictly sequential under nohup.
set -u
cd /root/repo
mkdir -p logs .synth

if [ ! -f /tmp/volta_synth_vqa/features.lmdb ]; then
  echo "=== generating synth vqa dataroot ($(date))"
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tools/make_synth_data.py vqa --out /tmp/volta_synth_vqa \
    --images 10000 --questions 30000 > logs/synth_vqa_r3o.log 2>&1
fi

cat > /tmp/volta_synth_vqa/tasks.yml <<YML
TASK1:
  name: VQA
  type: VL-classifier
  num_labels: 3129
  loss: BCEWithLogitLoss
  process: normal
  task_id: 1
  dataroot: /tmp/volta_synth_vqa
  features_h5path1: /tmp/volta_synth_vqa/features.lmdb
  features_h5path2: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 23
  max_region_num: 36
  batch_size: 256
  eval_batch_size: 1024
  train_split: train
  val_split: val
  lr: 0.0001
  num_epoch: 20
YML
sed 's/batch_size: 256/batch_size: 512/' /tmp/volta_synth_vqa/tasks.yml \
  > /tmp/volta_synth_vqa/tasks_b512.yml

if [ ! -f .synth/cc/imgfeats/training_feat_all.lmdb ]; then
  echo "=== generating synth cc corpus ($(date))"
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tools/make_synth_data.py cc --out .synth/cc --images 9000 \
    > logs/synth_cc_r3o.log 2>&1
fi

echo "=== bench: validate + device-only + loader-in-loop ($(date))"
python -u bench.py --validate --data_steps 150 \
  > logs/bench_r3o.log 2>&1 || true

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

echo "=== loader-in-loop prefetch A/B ($(date))"
python -u bench.py --skip_validate --prefetch 1 --data_steps 150 \
  > logs/bench_prefetch_r3o.log 2>&1 || true

echo "=== CC loader-in-loop kl+nce b512 ($(date))"
python -u tools/bench_pretrain.py --data .synth/cc \
  --targets kl nce --steps 30 --loader_steps 15 --device_store \
  > logs/bench_pretrain_r3o.log 2>&1 || true

echo "=== int8 roofline ($(date))"
python -u tools/int8_roofline.py > logs/int8_roofline_r3.log 2>&1 || true

echo "=== lxmert trace ($(date))"
python -u tools/bench_task_step.py \
  --config_file configs/ctrl_lxmert.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --vocab_file /tmp/volta_synth_vqa/vocab.txt \
  --trace /tmp/trace_lxmert_r3 > logs/bench_lxmert_trace_r3.log 2>&1 || true
python tools/analyze_trace.py /tmp/trace_lxmert_r3 \
  > logs/trace_lxmert_analysis_r3.log 2>&1 || true

echo "=== ALLDONE r3o ($(date))"
