#!/bin/bash
# Hardware validation of the two VERDICT-flagged fine-tune variants
# (lxmert-GQA asymmetric encoder, vl-bert VQA [MASK] pooling) on synthetic
# data at real config scale — one epoch each, single TPU process.
#
# Self-contained: generates the synthetic datasets + task configs under
# $SYNTH (default /root/repo/.synth) on first run.
set -u
cd /root/repo
SYNTH=${SYNTH:-/root/repo/.synth}
IMAGES=${IMAGES:-6000}

if [ ! -f "$SYNTH/vqa/features.lmdb" ]; then
  echo "=== generating synth vqa store ($(date))"
  python tools/make_synth_data.py vqa --out "$SYNTH/vqa" \
    --images "$IMAGES" --questions 30000
fi
if [ ! -f "$SYNTH/gqa/train_questions.json" ]; then
  echo "=== generating synth gqa annotations ($(date))"
  python tools/make_synth_data.py gqa --out "$SYNTH/gqa" \
    --images "$IMAGES" --questions 30000 --num_labels 1842
fi

cat > "$SYNTH/gqa/tasks.yml" <<EOF
TASK15:
  name: GQA
  type: VL-classifier-GQA
  num_labels: 1842
  loss: BCEWithLogitLoss
  process: normal
  task_id: 15
  dataroot: $SYNTH/gqa
  features_h5path1: $SYNTH/vqa/features.lmdb
  features_h5path2: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 23
  max_region_num: 36
  batch_size: 32
  eval_batch_size: 512
  train_split: train
  val_split: train
  lr: 5.0e-05
  num_epoch: 1
EOF

cat > "$SYNTH/vqa/tasks_vlbert.yml" <<EOF
TASK1:
  name: VQA
  type: VL-classifier
  num_labels: 3129
  loss: BCEWithLogitLoss
  process: normal
  task_id: 1
  dataroot: $SYNTH/vqa
  features_h5path1: $SYNTH/vqa/features.lmdb
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
  num_epoch: 1
  fusion_method: vl-bert_vqa
  embed_clf: true
EOF

echo "=== lxmert GQA ($(date))"
python -u train_task.py \
  --config_file configs/lxmert.json \
  --tasks_config_file "$SYNTH/gqa/tasks.yml" --task 15 \
  --vocab_file "$SYNTH/gqa/vocab.txt" \
  --output_dir "$SYNTH/gqa/save" --logdir "$SYNTH/gqa/logs" \
  --num_train_epochs 1 --num_workers 2 --in_memory True --device_store \
  --clip_grad_norm 5.0 --adam_correct_bias --weight_decay 0.01

echo "=== vl-bert VQA ($(date))"
python -u train_task.py \
  --config_file configs/vl-bert_base.json \
  --tasks_config_file "$SYNTH/vqa/tasks_vlbert.yml" --task 1 \
  --vocab_file "$SYNTH/vqa/vocab.txt" \
  --output_dir "$SYNTH/vqa/save" --logdir "$SYNTH/vqa/logs" \
  --num_train_epochs 1 --num_workers 2 --in_memory True --device_store \
  --clip_grad_norm 1.0 --adam_correct_bias --weight_decay 0.0001 \
  --warmup_steps 2000

echo "=== done ($(date))"
