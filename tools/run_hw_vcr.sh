#!/bin/bash
# Hardware validation of the VCR expand-process path (4-way multiple
# choice: image tiled over options, b64 -> 256 rows/step) on synthetic
# data at reference shapes (seq 60, 36 regions, det+GT merged features).
set -u
cd /root/repo
SYNTH=${SYNTH:-/root/repo/.synth}

if [ ! -f "$SYNTH/vcr/vcr_feat.lmdb" ]; then
  echo "=== generating synth vcr corpus ($(date))"
  python tools/make_synth_data.py vcr --out "$SYNTH/vcr" \
    --images 4000 --questions 10000
fi

cat > "$SYNTH/vcr/tasks.yml" <<YML
TASK5:
  name: VCR_Q-A
  type: VL-logit
  loss: CrossEntropyLoss
  process: expand
  task_id: 5
  dataroot: $SYNTH/vcr
  features_h5path1: $SYNTH/vcr/vcr_feat.lmdb
  features_h5path2: $SYNTH/vcr/vcr_gt_feat.lmdb
  train_annotations_jsonpath: $SYNTH/vcr/annotations/train.jsonl
  val_annotations_jsonpath: $SYNTH/vcr/annotations/train.jsonl
  max_seq_length: 60
  max_region_num: 36
  batch_size: 64
  train_split: train
  val_split: train
  lr: 0.00002
  num_epoch: 1
YML

echo "=== ctrl_uniter VCR Q-A ($(date))"
python -u train_task.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file "$SYNTH/vcr/tasks.yml" --task 5 \
  --vocab_file "$SYNTH/vcr/vocab.txt" \
  --output_dir "$SYNTH/vcr/save" --logdir "$SYNTH/vcr/logs" \
  --num_train_epochs 1 --num_workers 2 --in_memory True --device_store \
  --clip_grad_norm 1.0 --adam_correct_bias --weight_decay 0.01
echo "=== done ($(date))"
