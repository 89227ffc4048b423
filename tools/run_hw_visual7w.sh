#!/bin/bash
# Hardware validation of the V-logit-mc head (per-region logits, 101-slot
# candidate gather, det+GT merged 200-region inputs) on synthetic
# Visual7w pointing data at reference shapes.
set -u
cd /root/repo
SYNTH=${SYNTH:-/root/repo/.synth}

if [ ! -f "$SYNTH/v7w/v7w_feat.lmdb" ]; then
  echo "=== generating synth visual7w corpus ($(date))"
  python tools/make_synth_data.py visual7w --out "$SYNTH/v7w" --images 3000
fi

cat > "$SYNTH/v7w/tasks.yml" <<YML
TASK4:
  name: Visual7w
  type: V-logit-mc
  loss: BCEWithLogitLoss
  process: normal
  task_id: 4
  dataroot: $SYNTH/v7w
  features_h5path1: $SYNTH/v7w/v7w_feat.lmdb
  features_h5path2: $SYNTH/v7w/v7w_gt_feat.lmdb
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 20
  max_region_num: 200
  batch_size: 256
  train_split: train
  val_split: train
  lr: 0.00002
  num_epoch: 1
YML

echo "=== ctrl_vilbert Visual7w pointing ($(date))"
python -u train_task.py \
  --config_file configs/ctrl_vilbert_base.json \
  --tasks_config_file "$SYNTH/v7w/tasks.yml" --task 4 \
  --vocab_file "$SYNTH/v7w/vocab.txt" \
  --output_dir "$SYNTH/v7w/save" --logdir "$SYNTH/v7w/logs" \
  --num_train_epochs 1 --num_workers 2 --in_memory True \
  --clip_grad_norm 1.0 --adam_correct_bias --weight_decay 0.01
echo "=== done ($(date))"
