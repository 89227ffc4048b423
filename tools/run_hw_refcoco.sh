#!/bin/bash
# Hardware validation of the plain V-logit head (per-region IoU targets,
# REFER-format annotations) on synthetic RefCOCO+ data at reference shapes.
set -u
cd /root/repo
SYNTH=${SYNTH:-/root/repo/.synth}

if [ ! -f "$SYNTH/refcoco/refs(unc).p" ]; then
  echo "=== generating synth refcoco corpus ($(date))"
  python tools/make_synth_data.py refcoco --out "$SYNTH/refcoco" \
    --images 3000
fi

cat > "$SYNTH/refcoco/tasks.yml" <<YML
TASK10:
  name: refcoco+
  type: V-logit
  loss: BCEWithLogitLoss
  process: normal
  task_id: 10
  dataroot: $SYNTH/refcoco
  features_h5path1: $SYNTH/refcoco/refcoco+_feat.lmdb
  features_h5path2: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 30
  max_region_num: 36
  batch_size: 256
  train_split: train
  val_split: train
  lr: 0.0001
  num_epoch: 1
YML

echo "=== ctrl_uniter refcoco+ ($(date))"
python -u train_task.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file "$SYNTH/refcoco/tasks.yml" --task 10 \
  --vocab_file "$SYNTH/refcoco/vocab.txt" \
  --output_dir "$SYNTH/refcoco/save" --logdir "$SYNTH/refcoco/logs" \
  --num_train_epochs 1 --num_workers 2 --in_memory True \
  --clip_grad_norm 1.0 --adam_correct_bias --weight_decay 0.01
echo "=== done ($(date))"
