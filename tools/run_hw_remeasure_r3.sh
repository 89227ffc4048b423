#!/bin/bash
# Round-3 re-measurement batch at the new defaults (natural-layout
# attention + hash dropout): fresh profile trace, dual-stream step rates,
# CC pretraining kl/nce. One TPU process at a time — strictly sequential.
set -eu
cd /root/repo
mkdir -p logs .synth

# the VQA synth dataroot (features LMDB + annotations + vocab) — bench.py
# generates it on first use; do the same here so a fresh host works
if [ ! -f /tmp/volta_synth_vqa/features.lmdb ]; then
  echo "=== generating synth vqa dataroot ($(date))"
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tools/make_synth_data.py vqa --out /tmp/volta_synth_vqa \
    --images 10000 > logs/synth_vqa_remeasure.log 2>&1
fi

# 0. CC synth corpus (CPU-only generation, no TPU contention)
if [ ! -f .synth/cc/imgfeats/training_feat_all.lmdb ]; then
  echo "=== generating synth cc corpus ($(date))"
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tools/make_synth_data.py cc --out .synth/cc --images 9000 \
    > logs/synth_cc_r3.log 2>&1
fi

# VQA task yml over the cached synth dataroot (reference TASK1 shapes)
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

echo "=== perf_probe trace at new defaults ($(date))"
python -u tools/perf_probe.py --variants base --iters 30 \
  --trace /tmp/trace_r3nat > logs/perf_probe_r3nat.log 2>&1

echo "=== ctrl_vilbert VQA step ($(date))"
python -u tools/bench_task_step.py \
  --config_file configs/ctrl_vilbert_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --vocab_file /tmp/volta_synth_vqa/vocab.txt \
  > logs/bench_vilbert_r3.log 2>&1

echo "=== ctrl_lxmert VQA step ($(date))"
python -u tools/bench_task_step.py \
  --config_file configs/ctrl_lxmert.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --vocab_file /tmp/volta_synth_vqa/vocab.txt \
  > logs/bench_lxmert_r3.log 2>&1

echo "=== CC pretraining kl + nce, device store ($(date))"
python -u tools/bench_pretrain.py --data .synth/cc --targets kl nce \
  --steps 30 --loader_steps 15 --device_store \
  > logs/bench_pretrain_r3.log 2>&1

echo "=== ALLDONE ($(date))"
