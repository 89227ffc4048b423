#!/bin/bash
# Hardware smoke of the dialog process (VisDial: 10 rounds x 4 options
# text expansion, b8 -> 320 rows/step) — the last reference process type
# without a TPU run (orphan dataset; reference ships it unregistered).
set -u
cd /root/repo
SYNTH=${SYNTH:-/root/repo/.synth}

if [ ! -f "$SYNTH/vqa/features.lmdb" ]; then
  echo "=== generating synth vqa features ($(date))"
  python tools/make_synth_data.py vqa --out "$SYNTH/vqa" \
    --images 4000 --questions 1000
fi
if [ ! -f "$SYNTH/visdial/visdial_1.0_train.json" ]; then
  echo "=== generating synth visdial corpus ($(date))"
  python tools/make_synth_data.py visdial --out "$SYNTH/visdial" \
    --images 4000 --questions 2000
fi

cat > "$SYNTH/visdial/tasks.yml" <<YML
TASK3:
  name: VisualDialog
  type: VL-logit
  loss: CrossEntropyLoss
  process: dialog
  task_id: 3
  dataroot: $SYNTH/visdial
  features_h5path1: $SYNTH/vqa/features.lmdb
  features_h5path2: ''
  train_annotations_jsonpath: $SYNTH/visdial/visdial_1.0_train.json
  val_annotations_jsonpath: $SYNTH/visdial/visdial_1.0_train.json
  max_seq_length: 30
  max_region_num: 36
  batch_size: 8
  train_split: train
  val_split: train
  lr: 0.00002
  num_epoch: 1
YML

echo "=== ctrl_uniter VisDial ($(date))"
python -u train_task.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file "$SYNTH/visdial/tasks.yml" --task 3 \
  --vocab_file "$SYNTH/vqa/vocab.txt" \
  --output_dir "$SYNTH/visdial/save" --logdir "$SYNTH/visdial/logs" \
  --num_train_epochs 1 --num_workers 2 \
  --clip_grad_norm 1.0 --adam_correct_bias --weight_decay 0.01
echo "=== done ($(date))"
