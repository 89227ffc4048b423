#!/bin/bash
# Hardware validation of the NLVR2 pair process (2 images/statement, 72+2
# regions, question duplicated across the pair) at reference shapes.
set -u
cd /root/repo
SYNTH=${SYNTH:-/root/repo/.synth}

if [ ! -f "$SYNTH/nlvr2/features.lmdb" ]; then
  echo "=== generating synth nlvr2 corpus ($(date))"
  python tools/make_synth_data.py nlvr2 --out "$SYNTH/nlvr2" \
    --images 4000 --questions 10000
fi

cat > "$SYNTH/nlvr2/tasks.yml" <<YML
TASK12:
  name: NLVR2
  type: VL-binary-classifier
  num_labels: 2
  loss: CrossEntropyLoss
  process: nlvr
  task_id: 12
  dataroot: $SYNTH/nlvr2
  features_h5path1: $SYNTH/nlvr2/features.lmdb
  features_h5path2: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 26
  max_region_num: 73
  batch_size: 64
  train_split: train
  val_split: train
  lr: 0.00002
  num_epoch: 1
YML

echo "=== ctrl_vilbert NLVR2 ($(date))"
python -u train_task.py \
  --config_file configs/ctrl_vilbert_base.json \
  --tasks_config_file "$SYNTH/nlvr2/tasks.yml" --task 12 \
  --vocab_file "$SYNTH/nlvr2/vocab.txt" \
  --output_dir "$SYNTH/nlvr2/save" --logdir "$SYNTH/nlvr2/logs" \
  --num_train_epochs 1 --num_workers 2 --in_memory True --device_store \
  --clip_grad_norm 1.0 --adam_correct_bias --weight_decay 0.01
echo "=== done ($(date))"
