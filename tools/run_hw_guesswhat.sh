#!/bin/bash
# Hardware validation of the GuessWhat oracle task (dialog-turn yes/no/NA,
# 3-way soft targets) over the existing synthetic VQA feature store.
set -u
cd /root/repo
SYNTH=${SYNTH:-/root/repo/.synth}

if [ ! -f "$SYNTH/guesswhat/guesswhat.train.jsonl" ]; then
  echo "=== generating synth guesswhat annotations ($(date))"
  python tools/make_synth_data.py guesswhat --out "$SYNTH/guesswhat" \
    --images 6000 --questions 15000
fi

cat > "$SYNTH/guesswhat/tasks.yml" <<YML
TASK14:
  name: GuessWhat
  type: VL-tri-classifier
  num_labels: 3
  loss: BCEWithLogitLoss
  process: normal
  task_id: 14
  dataroot: $SYNTH/guesswhat
  features_h5path1: $SYNTH/vqa/features.lmdb
  features_h5path2: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 25
  max_region_num: 36
  batch_size: 256
  train_split: train
  val_split: train
  lr: 0.00004
  num_epoch: 1
YML

echo "=== ctrl_uniter GuessWhat ($(date))"
python -u train_task.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file "$SYNTH/guesswhat/tasks.yml" --task 14 \
  --vocab_file "$SYNTH/guesswhat/vocab.txt" \
  --output_dir "$SYNTH/guesswhat/save" --logdir "$SYNTH/guesswhat/logs" \
  --num_train_epochs 1 --num_workers 2 --in_memory True --device_store \
  --clip_grad_norm 1.0 --adam_correct_bias --weight_decay 0.01
echo "=== done ($(date))"
