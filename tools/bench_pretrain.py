#!/usr/bin/env python
"""Hardware benchmark for the CC pretraining step (VERDICT #2).

Measures, on the real TPU, at reference shapes (global batch 512, seq 36,
36+1 regions — reference: train_concap.py:60-68):
  1. device-only step rate (one host batch re-fed) per visual target
     (kl / nce / mse), and
  2. end-to-end rate with the packed loader feeding fresh batches.

Prints one JSON line per measurement.

Usage (single TPU process!):
  python tools/bench_pretrain.py --data /root/synth/cc \
      [--config configs/ctrl_uniter_base.json] [--steps 30] [--targets kl nce]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET_IX = {"kl": "0", "mse": "1", "nce": "2", "xobj": "3", "xattr": "4",
             "huber": "5", "x1601": "6",
             # reference loss names as aliases (losses.py pre_vis_targets)
             "xent": "3", "xent_1600": "3", "xent_400": "4",
             "xent_1601": "6", "kl_1601": "0", "mse_2048": "1",
             "nce_2048": "2", "huber_2048": "5"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--config", default="configs/ctrl_uniter_base.json")
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--seq_len", type=int, default=36)
    p.add_argument("--region_len", type=int, default=36)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--loader_steps", type=int, default=60)
    p.add_argument("--targets", nargs="*", default=["kl", "nce"])
    p.add_argument("--objective", type=int, default=0)
    p.add_argument("--skip_loader", action="store_true")
    p.add_argument("--device_store", action="store_true",
                   help="features/targets resident in HBM; loader ships "
                        "indices + mask draws only")
    p.add_argument("--trace", default=None,
                   help="capture a jax.profiler trace of the timed "
                        "device-only loop (first target) into this dir")
    p.add_argument("--nce_chunk", type=int, default=0,
                   help="force the NCE blockwise score scan with this "
                        "chunk size (0 = dense-path default)")
    p.add_argument("--nce_score_f32", action="store_true",
                   help="A/B control: force the f32 score tensor instead "
                        "of the input-dtype (bf16) one")
    p.add_argument("--nce_shared_negatives", action="store_true",
                   help="opt-in shared cross-batch negatives (see "
                        "losses._NCE_SHARED_NEGATIVES): removes the "
                        "all-pairs score matmul + giant gather")
    args = p.parse_args()

    if args.nce_chunk:
        from volta_tpu import losses
        losses._NCE_DENSE_SCORE_BYTES = 0
        losses._NCE_CHUNK = args.nce_chunk
        print(f"NCE forced to blockwise scan, chunk={args.nce_chunk}")
    if args.nce_score_f32:
        from volta_tpu import losses
        losses._NCE_SCORE_DTYPE_FOLLOWS_INPUT[0] = False
        print("NCE score tensor forced to f32")
    if args.nce_shared_negatives:
        from volta_tpu import losses
        losses._NCE_SHARED_NEGATIVES[0] = True
        print("NCE shared cross-batch negatives ON")

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    from volta_tpu.config import VoltaConfig
    from volta_tpu.data.datasets.concap import make_concap_loader
    from volta_tpu.models import VoltaForVLPreTraining
    from volta_tpu.optimization import build_optimizer, warmup_linear_schedule
    from volta_tpu.parallel import (create_train_state, make_mesh,
                                    make_pretrain_step, shard_batch)
    from volta_tpu.task_utils import make_tokenizer

    base = VoltaConfig.from_json_file(args.config)
    base.compute_dtype = "bfloat16"
    tokenizer = make_tokenizer("bert-base-uncased", True,
                               os.path.join(args.data, "vocab.txt"))
    ds, loader = make_concap_loader(
        os.path.join(args.data, "imgfeats"),
        os.path.join(args.data, "annotations"), tokenizer,
        split="train", seq_len=args.seq_len, region_len=args.region_len,
        batch_size=args.batch_size, num_workers=2,
        objective=args.objective, num_locs=base.num_locs,
        add_global_imgfeat=base.add_global_imgfeat, packed=True,
        feat_dtype="bfloat16")
    it = iter(loader)
    host_batch = next(it)  # dense: used for model init

    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    n_dev = len(jax.devices())
    if args.device_store:
        ds.enable_device_store()
        it = iter(loader)  # small batches from here on

    for tgt in args.targets:
        cfg = VoltaConfig.from_json_file(args.config)
        cfg.compute_dtype = "bfloat16"
        cfg.visual_target_weights = {TARGET_IX[tgt]: 1.0}
        store = None
        if args.device_store:
            # per-objective store: e.g. NCE drops the 4.3 GiB cls array
            store = jax.device_put(
                ds.device_store_arrays(targets={TARGET_IX[tgt]}),
                jax.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        model = VoltaForVLPreTraining(cfg)
        params = jax.jit(lambda r: model.init(
            r, host_batch["input_ids"], host_batch["image_feat"],
            host_batch["image_loc"], host_batch["segment_ids"],
            host_batch["input_mask"], host_batch["image_mask"]))(
            jax.random.PRNGKey(0))["params"]
        tx = build_optimizer("adamw", warmup_linear_schedule(1e-4, 100, 1e5),
                             params, weight_decay=0.01, clip_norm=None)
        state = create_train_state(jax.random.PRNGKey(1), params, tx)
        state = jax.device_put(state, jax.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        step = make_pretrain_step(model, tx, cfg,
                                  objective=args.objective, mesh=mesh,
                                  store=store)
        batch = shard_batch(mesh, ds.get_batch(np.arange(args.batch_size))
                            if store is not None else host_batch)
        for _ in range(2):  # compile + donation warmup
            state, m = step(state, batch)
            _ = float(m["loss"])

        tracing = args.trace and tgt == args.targets[0]
        if tracing:
            jax.profiler.start_trace(args.trace)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, batch)
        _ = float(m["loss"])
        dt = time.perf_counter() - t0
        if tracing:
            jax.profiler.stop_trace()
        rate = args.batch_size * args.steps / dt / n_dev
        print(json.dumps({
            "metric": f"CC pretrain step ({tgt}, device-only)",
            "value": round(rate, 1),
            "unit": f"pairs/sec/chip (b{args.batch_size} seq{args.seq_len} "
                    f"r{args.region_len}+1 bf16 {os.path.basename(args.config)})",
            "ms_per_step": round(1000 * dt / args.steps, 1)}), flush=True)

        if tgt == args.targets[0] and not args.skip_loader:
            # end-to-end: packed loader feeding fresh batches every step
            n = 0
            t0 = time.perf_counter()
            for hb in it:
                state, m = step(state, shard_batch(mesh, hb))
                n += 1
                if n >= args.loader_steps:
                    break
            _ = float(m["loss"])
            dt = time.perf_counter() - t0
            rate = args.batch_size * n / dt / n_dev
            print(json.dumps({
                "metric": f"CC pretrain step ({tgt}, loader-in-loop)",
                "value": round(rate, 1),
                "unit": f"pairs/sec/chip over {n} fresh batches",
                "ms_per_step": round(1000 * dt / n, 1)}), flush=True)


if __name__ == "__main__":
    main()
