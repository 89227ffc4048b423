#!/bin/bash
# RoBERTa-on-TPU smoke (VERDICT r2 missing #3 follow-through): one real
# fine-tune epoch + val of a full-dims roberta-flagged ctrl_uniter on the
# synthetic VQA corpus, driven by the real CLI with the from-scratch
# byte-level BPE tokenizer (--bert_model roberta-base activates it the
# reference way, volta train_task.py:179-180).
# Waits for the r3o batch to release the TPU (one process at a time).
set -u
cd /root/repo
mkdir -p logs

for i in $(seq 1 720); do
  grep -q "ALLDONE r3o" logs/run_hw_r3o.log 2>/dev/null && break
  sleep 30
done
grep -q "ALLDONE r3o" logs/run_hw_r3o.log || {
  echo "r3o never finished; aborting roberta smoke"; exit 1; }

PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF'
import json, os
from volta_tpu import zoo
from volta_tpu.data.bpe import bytes_to_unicode

d = "/tmp/volta_synth_vqa/roberta_vocab"
os.makedirs(d, exist_ok=True)
vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
for u in bytes_to_unicode().values():
    vocab.setdefault(u, len(vocab))
json.dump(vocab, open(os.path.join(d, "vocab.json"), "w"))
open(os.path.join(d, "merges.txt"), "w").write("#version: 0.2\n")

cfg = zoo.build("ctrl_uniter_base", model="roberta",
                vocab_size=len(vocab) + 3)
open("/tmp/volta_synth_vqa/roberta_uniter.json", "w").write(
    cfg.to_json_string())
EOF

echo "=== roberta VQA fine-tune smoke on TPU ($(date))"
python -u train_task.py \
  --config_file /tmp/volta_synth_vqa/roberta_uniter.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --bert_model roberta-base \
  --vocab_file /tmp/volta_synth_vqa/roberta_vocab \
  --output_dir /tmp/roberta_smoke_save --logdir /tmp/roberta_smoke_logs \
  --num_train_epochs 1 --num_workers 2 --in_memory True \
  > logs/hw_roberta_r3.log 2>&1 || true
grep -E "VAL epoch|pairs/s|steps" logs/hw_roberta_r3.log | tail -5
echo "=== ALLDONE r3p ($(date))"
