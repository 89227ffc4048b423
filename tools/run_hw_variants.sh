#!/bin/bash
# Hardware validation of the two VERDICT-flagged fine-tune variants
# (lxmert-GQA asymmetric encoder, vl-bert VQA [MASK] pooling) on synthetic
# data at real config scale — one epoch each, single TPU process.
set -u
cd /root/repo

# wait for any other TPU job to drain (one process at a time)
while pgrep -f "perf_probe|bench_pretrain|bench.py" > /dev/null; do
  sleep 30
done

echo "=== lxmert GQA ($(date))"
python -u train_task.py \
  --config_file configs/lxmert.json \
  --tasks_config_file /root/synth/gqa/tasks.yml --task 15 \
  --vocab_file /root/synth/gqa/vocab.txt \
  --output_dir /root/synth/gqa/save --logdir /root/synth/gqa/logs \
  --num_train_epochs 1 --num_workers 2 --in_memory True --device_store \
  --clip_grad_norm 5.0 --adam_correct_bias --weight_decay 0.01

echo "=== vl-bert VQA ($(date))"
python -u train_task.py \
  --config_file configs/vl-bert_base.json \
  --tasks_config_file /root/synth/vqa/tasks_vlbert.yml --task 1 \
  --vocab_file /root/synth/vqa/vocab.txt \
  --output_dir /root/synth/vqa/save --logdir /root/synth/vqa/logs \
  --num_train_epochs 1 --num_workers 2 --in_memory True --device_store \
  --clip_grad_norm 1.0 --adam_correct_bias --weight_decay 0.0001 \
  --warmup_steps 2000

echo "=== done ($(date))"
