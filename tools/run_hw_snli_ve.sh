#!/bin/bash
# Hardware validation of the VL-tri-classifier head (SNLI-VE 3-way soft
# targets) over the existing synthetic VQA feature store.
set -u
cd /root/repo
SYNTH=${SYNTH:-/root/repo/.synth}

if [ ! -f "$SYNTH/snli/snli_ve_train.jsonl" ]; then
  echo "=== generating synth snli-ve annotations ($(date))"
  python tools/make_synth_data.py snli_ve --out "$SYNTH/snli" \
    --images 6000 --questions 15000
fi

cat > "$SYNTH/snli/tasks.yml" <<YML
TASK13:
  name: VisualEntailment
  type: VL-tri-classifier
  num_labels: 3
  loss: BCEWithLogitLoss
  process: normal
  task_id: 13
  dataroot: $SYNTH/snli
  features_h5path1: $SYNTH/vqa/features.lmdb
  features_h5path2: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 56
  max_region_num: 36
  batch_size: 128
  train_split: train
  val_split: train
  lr: 0.00002
  num_epoch: 1
YML

echo "=== ctrl_uniter SNLI-VE ($(date))"
python -u train_task.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file "$SYNTH/snli/tasks.yml" --task 13 \
  --vocab_file "$SYNTH/snli/vocab.txt" \
  --output_dir "$SYNTH/snli/save" --logdir "$SYNTH/snli/logs" \
  --num_train_epochs 1 --num_workers 2 --in_memory True --device_store \
  --clip_grad_norm 1.0 --adam_correct_bias --weight_decay 0.01
echo "=== done ($(date))"
