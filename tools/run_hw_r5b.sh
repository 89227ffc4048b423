#!/bin/bash
# Round-5 hardware batch B:
#   1. pretraining perf chapter (VERDICT r5 #2): re-measure all five CC
#      objectives at HEAD, trace kl AND nce steps
#   2. int8 eval/retrieval ladder (VERDICT r5 #8): eval forward + the
#      retrieval gallery scorer at --quantize int8 across dispatch sizes
#   3. orphan TPU smokes (VERDICT r5 #9): ReferDenseCaption + VisMadLibs
# One TPU process at a time — strictly sequential.
set -u
cd /root/repo
SYNTH=${SYNTH:-/root/repo/.synth}
mkdir -p logs

# wait out tunnel outages before each TPU job (the known multi-hour
# UNAVAILABLE windows, CLAUDE.md): bounded subprocess probes
wait_backend() {
  for i in $(seq 1 60); do
    if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    echo "backend unavailable, retry $i/60 ($(date))"
    sleep 240
  done
  echo "backend never came back"; exit 1
}

# ---------- 1. pretraining chapter ----------
if [ ! -d "$SYNTH/cc" ]; then
  echo "=== generating synth cc ($(date))"
  python tools/make_synth_data.py cc --out "$SYNTH/cc" --images 9000
fi

grep -q "nce, device-only" logs/bench_pretrain_r5b.log 2>/dev/null || {
echo "=== CC pretraining 5 objectives at HEAD ($(date))"
python -u tools/bench_pretrain.py --data "$SYNTH/cc" \
  --targets kl mse huber xobj nce --steps 30 --loader_steps 15 \
  --device_store >> logs/bench_pretrain_r5b.log 2>&1
}
grep "device-only" logs/bench_pretrain_r5b.log | tail -8

grep -q "device self time" logs/trace_cc_kl_r5_analysis.log 2>/dev/null || {
wait_backend
echo "=== CC kl trace ($(date))"
python -u tools/bench_pretrain.py --data "$SYNTH/cc" --targets kl \
  --steps 20 --skip_loader --trace /tmp/trace_cc_kl_r5 > logs/bench_cc_kl_trace_r5.log 2>&1
python tools/analyze_trace.py /tmp/trace_cc_kl_r5 \
  > logs/trace_cc_kl_r5_analysis.log 2>&1 || true
tail -15 logs/trace_cc_kl_r5_analysis.log
}

grep -q "device self time" logs/trace_cc_nce_r5_analysis.log 2>/dev/null || {
wait_backend
echo "=== CC nce trace ($(date))"
python -u tools/bench_pretrain.py --data "$SYNTH/cc" --targets nce \
  --steps 20 --skip_loader --trace /tmp/trace_cc_nce_r5 > logs/bench_cc_nce_trace_r5.log 2>&1
python tools/analyze_trace.py /tmp/trace_cc_nce_r5 \
  > logs/trace_cc_nce_r5_analysis.log 2>&1 || true
tail -15 logs/trace_cc_nce_r5_analysis.log
}

# ---------- 2. int8 eval ladder ----------
for b in 64 256 1024; do
  for q in "" "--quantize int8"; do
    tag=$( [ -z "$q" ] && echo bf16 || echo int8 )
    log=logs/bench_evalfwd_b${b}_${tag}_r5.log
    grep -q "pairs/sec" "$log" 2>/dev/null && continue
    wait_backend
    echo "=== eval forward b$b $tag ($(date))"
    timeout 2400 python -u tools/bench_eval_forward.py --batch $b $q > "$log" 2>&1
    tail -1 "$log"
  done
done

if [ ! -f "$SYNTH/vqa/features.lmdb" ]; then
  echo "=== generating synth vqa features ($(date))"
  python tools/make_synth_data.py vqa --out "$SYNTH/vqa" \
    --images 4000 --questions 1000
fi
if [ ! -f "$SYNTH/retrieval/all_data_final_test_set0_2014.jsonline" ]; then
  echo "=== generating synth retrieval ($(date))"
  python tools/make_synth_data.py retrieval --out "$SYNTH/retrieval" \
    --images 2000
fi
cat > "$SYNTH/retrieval/tasks.yml" <<YML
TASK8:
  name: RetrievalFlickr30k
  type: VL-logit
  num_labels: 1
  loss: CrossEntropyLoss
  process: retrieval
  task_id: 8
  dataroot: $SYNTH/retrieval
  features_h5path1: $SYNTH/vqa/features.lmdb
  features_h5path2: ''
  train_annotations_jsonpath: $SYNTH/retrieval/all_data_final_test_set0_2014.jsonline
  val_annotations_jsonpath: $SYNTH/retrieval/all_data_final_test_set0_2014.jsonline
  max_seq_length: 30
  max_region_num: 36
  batch_size: 64
  eval_batch_size: 1
  train_split: train
  val_split: test
  lr: 0.00002
  num_epoch: 1
YML
for q in "" "--quantize int8"; do
  tag=$( [ -z "$q" ] && echo bf16 || echo int8 )
  grep -q "retrieval" logs/bench_retrieval_${tag}_r5.log 2>/dev/null && continue
  wait_backend
  echo "=== retrieval gallery $tag ($(date))"
  python -u eval_retrieval.py \
    --config_file configs/ctrl_uniter_base.json \
    --tasks_config_file "$SYNTH/retrieval/tasks.yml" --task 8 \
    --vocab_file "$SYNTH/retrieval/vocab.txt" --split test \
    --captions_per_forward 8 --output_dir /tmp/retr_r5_${tag} $q \
    > logs/bench_retrieval_${tag}_r5.log 2>&1
  grep -E "pairs/sec|R@|score matrix" logs/bench_retrieval_${tag}_r5.log | tail -4
done

# ---------- 3. orphan smokes ----------
if [ ! -f "$SYNTH/vqa/features.lmdb" ]; then
  echo "=== generating synth vqa features ($(date))"
  python tools/make_synth_data.py vqa --out "$SYNTH/vqa" \
    --images 4000 --questions 1000
fi
python tools/make_synth_data.py dense_caption --out "$SYNTH/dense_caption" \
  --images 4000 --questions 1200
python tools/make_synth_data.py madlibs --out "$SYNTH/madlibs" \
  --images 4000 --questions 1500

cat > "$SYNTH/dense_caption/tasks.yml" <<YML
TASK21:
  name: ReferDenseCaption
  type: V-logit
  loss: BCEWithLogitLoss
  process: normal
  task_id: 21
  dataroot: $SYNTH/dense_caption
  features_h5path1: $SYNTH/vqa/features.lmdb
  features_h5path2: $SYNTH/vqa/features.lmdb
  train_annotations_jsonpath: $SYNTH/dense_caption/region_descriptions.json
  val_annotations_jsonpath: $SYNTH/dense_caption/region_descriptions.json
  max_seq_length: 20
  max_region_num: 36
  batch_size: 64
  train_split: test
  val_split: test
  lr: 0.00004
  num_epoch: 1
YML

cat > "$SYNTH/madlibs/tasks.yml" <<YML
TASK22:
  name: VisMadLibs
  type: VL-classifier
  loss: BCEWithLogitLoss
  process: normal
  task_id: 22
  dataroot: $SYNTH/madlibs
  features_h5path1: $SYNTH/vqa/features.lmdb
  features_h5path2: ''
  train_annotations_jsonpath: $SYNTH/madlibs/madlibs_train.json
  val_annotations_jsonpath: $SYNTH/madlibs/madlibs_train.json
  max_seq_length: 20
  max_region_num: 36
  batch_size: 64
  num_labels: 3129
  train_split: train
  val_split: train
  lr: 0.00004
  num_epoch: 1
YML

wait_backend
echo "=== ctrl_uniter ReferDenseCaption smoke ($(date))"
python -u train_task.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file "$SYNTH/dense_caption/tasks.yml" --task 21 \
  --vocab_file "$SYNTH/vqa/vocab.txt" \
  --output_dir "$SYNTH/dense_caption/save" \
  --logdir "$SYNTH/dense_caption/logs" \
  --num_train_epochs 1 --num_workers 2 \
  --clip_grad_norm 1.0 --adam_correct_bias --weight_decay 0.01 \
  > logs/hw_dense_caption_r5.log 2>&1
grep -E "VAL epoch|steps" logs/hw_dense_caption_r5.log | tail -3

wait_backend
echo "=== ctrl_uniter VisMadLibs smoke ($(date))"
python -u train_task.py \
  --config_file configs/ctrl_uniter_base.json \
  --tasks_config_file "$SYNTH/madlibs/tasks.yml" --task 22 \
  --vocab_file "$SYNTH/vqa/vocab.txt" \
  --output_dir "$SYNTH/madlibs/save" --logdir "$SYNTH/madlibs/logs" \
  --num_train_epochs 1 --num_workers 2 \
  --clip_grad_norm 1.0 --adam_correct_bias --weight_decay 0.01 \
  > logs/hw_madlibs_r5.log 2>&1
grep -E "VAL epoch|steps" logs/hw_madlibs_r5.log | tail -3

echo "=== DONE r5b ($(date))"
