#!/usr/bin/env python
"""Device-only step-rate benchmark for an arbitrary fine-tuning task.

The loader-in-loop hardware runs (tools/run_hw_*.sh) measure the full
system; this probe isolates the jitted train step by looping over ONE
device-resident dense batch pulled from the same dataset/loader, so the
"X% of device-only" comparison (VERDICT round 2 #3) is apples-to-apples:
same config, same process reshape, same batch layout, no host work.

With --with_data the probe instead times the same jitted step over FRESH
batches from the real DataLoader (device-resident feature store on by
default), giving the precise loader-in-loop rate that the CLI's
second-resolution log timestamps cannot.

Usage (single TPU process):
  python tools/bench_task_step.py --config_file configs/ctrl_uniter_base.json \
      --tasks_config_file .synth/vcr/tasks.yml --task 5 \
      --vocab_file .synth/vcr/vocab.txt [--iters 30] [--with_data]
"""

import argparse
import json
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--tasks_config_file", required=True)
    p.add_argument("--task", required=True)
    p.add_argument("--vocab_file", required=True)
    p.add_argument("--bert_model", default="bert-base-uncased",
                   help="tokenizer family; roberta* selects the BPE "
                        "tokenizer (vocab_file is then the BPE dir)")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--with_data", action="store_true",
                   help="time fresh loader batches (device store when the "
                        "dataset supports it) instead of one resident batch")
    p.add_argument("--no_device_store", action="store_true")
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--trace", default=None,
                   help="capture a jax.profiler trace of the timed "
                        "device-only loop into this directory (analyze "
                        "with tools/analyze_trace.py)")
    p.add_argument("--set", nargs="*", default=[], dest="overrides",
                   metavar="KEY=VALUE",
                   help="VoltaConfig overrides for A/Bs, e.g. "
                        "fuse_dual_stream=false (values parsed as JSON, "
                        "falling back to string)")
    args = p.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_default_prng_impl", "rbg")

    from volta_tpu.config import VoltaConfig
    from volta_tpu.models import VoltaForVLTasks
    from volta_tpu.optimization import build_optimizer, warmup_linear_schedule
    from volta_tpu.parallel import (create_train_state, make_mesh,
                                    make_task_train_step, replicated,
                                    shard_batch)
    from volta_tpu.task_utils import (load_dataset, load_task_config,
                                      process_batch, task_key)

    cfg = VoltaConfig.from_json_file(args.config_file)
    cfg.compute_dtype = args.compute_dtype
    for kv in args.overrides:
        key, _, val = kv.partition("=")
        if not hasattr(cfg, key):
            raise SystemExit(f"--set: unknown config field {key!r}")
        import json as _json
        try:
            val = _json.loads(val)
        except ValueError:
            pass
        cur = getattr(cfg, key)
        if isinstance(cur, bool) and not isinstance(val, bool):
            # "False" (Python spelling) would set a truthy string and
            # silently measure the wrong arm of an A/B
            raise SystemExit(
                f"--set: {key} is a bool; use true/false (got {val!r})")
        setattr(cfg, key, val)
        print(f"override: cfg.{key} = {val!r}")
    task_cfg = load_task_config(args.tasks_config_file)
    task = task_key(args.task)
    tc = task_cfg[task]
    if tc.get("fusion_method"):
        cfg.fusion_method = tc["fusion_method"]

    ds_args = SimpleNamespace(
        bert_model=args.bert_model, do_lower_case=True,
        vocab_file=args.vocab_file, grad_acc_steps=1, seed=0,
        num_workers=args.num_workers if args.with_data else 0,
        in_memory=args.with_data)
    data = load_dataset(ds_args, cfg, task_cfg, args.task, split="train")
    if "num_labels" not in tc and hasattr(data["train_dataset"], "num_labels"):
        tc["num_labels"] = data["train_dataset"].num_labels
    b = data["batch_size"]
    batch = {k: np.asarray(v)
             for k, v in next(iter(data["train_loader"])).items()}

    model = VoltaForVLTasks(cfg, task_cfg, (task,))
    inputs, _ = process_batch(tc, batch)
    params = jax.jit(lambda r: model.init(
        r, inputs["input_ids"], inputs["image_feat"], inputs["image_loc"],
        task, inputs["token_type_ids"], inputs["attention_mask"],
        inputs["image_attention_mask"]))(jax.random.PRNGKey(0))["params"]

    mesh = make_mesh(n_data=1)
    tx = build_optimizer("adamw", warmup_linear_schedule(2e-5, 100, 10000),
                         params, clip_norm=1.0, weight_decay=0.01)
    state = create_train_state(jax.random.PRNGKey(1), params, tx)
    state = jax.device_put(state, replicated(mesh))
    del params

    store = None
    train_ds = data["train_dataset"]
    label = "device-only"
    if args.with_data and not args.no_device_store and \
            hasattr(train_ds, "enable_device_store"):
        # same ordering as train_task.py: loader built first, then the
        # store flag flips the dataset's batch emission to indices+targets
        train_ds.enable_device_store(
            feat_dtype=("bfloat16" if args.compute_dtype == "bfloat16"
                        else "float32"))
        store = jax.device_put(train_ds.device_store_arrays(),
                               replicated(mesh))
    step = make_task_train_step(model, tx, task_cfg, task, mesh=mesh,
                                store=store)

    # sync via float() — block_until_ready is unreliable on this platform
    if args.with_data:
        label = ("device-store loader-in-loop" if store is not None
                 else "loader-in-loop")
        it = iter(data["train_loader"])
        state, m = step(state, shard_batch(mesh, next(it)))  # compile
        float(m["loss"])
        n = 0
        t0 = time.perf_counter()
        for hb in it:
            state, m = step(state, shard_batch(mesh, hb))
            n += 1
            if n >= args.iters:
                break
        _ = float(m["loss"])
        dt = time.perf_counter() - t0
        iters = n
    else:
        sharded = shard_batch(mesh, batch)
        # two warmup calls (donation relayout), then the timed loop
        state, m = step(state, sharded)
        float(m["loss"])
        state, m = step(state, sharded)
        float(m["loss"])
        if args.trace:
            jax.profiler.start_trace(args.trace)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step(state, sharded)
        _ = float(m["loss"])
        dt = time.perf_counter() - t0
        if args.trace:
            jax.profiler.stop_trace()
        iters = args.iters

    ms = dt / iters * 1000
    print(json.dumps({
        "metric": f"{tc['name']} train step ({label})",
        "value": round(b * iters / dt, 1),
        "unit": f"pairs/sec/chip (b{b} {tc.get('process', 'normal')} "
                f"process, {os.path.basename(args.config_file)})",
        "ms_per_step": round(ms, 1)}), flush=True)


if __name__ == "__main__":
    main()
