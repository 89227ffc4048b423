#!/bin/bash
# Round-4e final hardware batch:
#   1. bf16 b1 serving re-measure at the current export defaults — the
#      round-3 9.23 ms/call figure predates the batched-head kernels and
#      underpins the "int8 5.5x at b1" claim; make it apples-to-apples
#   2. TPU smoke of the new eval_task --dump_attn path (visualization
#      maps computed on-device at a real batch size)
#   3. end-of-round kernel validation + headline bench (what the driver
#      will run; catch surprises before it does)
set -u
cd /root/repo
mkdir -p logs

echo "=== bf16 b1 serving re-measure ($(date))"
python -u tools/export_model.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --out /tmp/vqa_bf16_b1.stablehlo --batch_size 1 --use_pallas \
  --check --bench 200 \
  > logs/bench_serving_b1_r4.log 2>&1 || true
grep "serving bench" logs/bench_serving_b1_r4.log

echo "=== eval_task --dump_attn TPU smoke ($(date))"
python -u eval_task.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file /tmp/volta_synth_vqa/tasks.yml --task 1 \
  --vocab_file /tmp/volta_synth_vqa/vocab.txt \
  --output_dir /tmp/attn_dump_r4 --batch_size 64 --num_workers 0 \
  --dump_attn 1 \
  > logs/hw_dump_attn_r4.log 2>&1 || true
grep -E "attention arrays|eval loss" logs/hw_dump_attn_r4.log
python - <<'EOF'
import glob
import numpy as np
fs = glob.glob("/tmp/attn_dump_r4/attn_*.npz")
if fs:
    z = np.load(fs[0])
    probs = [k for k in z.files if k.endswith("_intra_attn")]
    print("attn npz ok:", len(z.files), "arrays;",
          probs[0], z[probs[0]].shape)
EOF

echo "=== validate + headline bench ($(date))"
python -u bench.py --validate > logs/bench_r4_final.log 2>&1 || true
tail -2 logs/bench_r4_final.log

echo "=== ALLDONE r4e ($(date))"
