#!/usr/bin/env python
"""Eval-forward throughput at serving shapes (device-resident inputs).

Times the deterministic task forward (the eval_task inner loop's jitted
fn) over a device-put batch passed as jit ARGUMENTS — unlike perf_probe's
fwd_eval sub-probe, nothing is embedded as a jaxpr constant, so the
number is the device compute rate, not a transport artifact. Sync is a
scalar reduction fetch (this platform's block_until_ready is unreliable;
see CLAUDE.md).

Usage (single TPU process): python tools/bench_eval_forward.py [--batch 1024]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--seq", type=int, default=23)
    p.add_argument("--regions", type=int, default=37)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="int8 dynamic-quantized dense path (the serving "
                        "winner at b64-128; ladder: VERDICT r5 #8)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _flagship, _task_cfg, _vqa_batch
    from volta_tpu.models import VoltaForVLTasks

    cfg = _flagship()
    task_cfg = _task_cfg()
    model = VoltaForVLTasks(cfg, task_cfg, ("TASK1",))
    batch = _vqa_batch(cfg, args.batch, args.seq, args.regions)
    params = jax.jit(lambda r: model.init(
        r, batch["question"], batch["features"], batch["spatials"],
        "TASK1", batch["segment_ids"], batch["input_mask"],
        batch["image_mask"]))(jax.random.PRNGKey(0))["params"]

    dev = {k: jax.device_put(jnp.asarray(v)) for k, v in batch.items()}

    if args.quantize == "int8":
        from volta_tpu.export import quantize_residual_dtype
        from volta_tpu.ops.int8_dense import (apply_quantized,
                                              quantize_variables)

        rd = quantize_residual_dtype(cfg)
        params = jax.jit(lambda v: quantize_variables(
            v, residual_dtype=rd))({"params": params})

        @jax.jit
        def fwd(params, q, f, s, seg, im, vm):
            pred, _ = apply_quantized(model, params, q, f, s, "TASK1",
                                      seg, im, vm, deterministic=True)
            return jnp.sum(pred.astype(jnp.float32))
    else:
        @jax.jit
        def fwd(params, q, f, s, seg, im, vm):
            pred, _ = model.apply({"params": params}, q, f, s, "TASK1",
                                  seg, im, vm, deterministic=True)
            return jnp.sum(pred.astype(jnp.float32))

    a = (dev["question"], dev["features"], dev["spatials"],
         dev["segment_ids"], dev["input_mask"], dev["image_mask"])
    _ = float(fwd(params, *a))  # compile
    _ = float(fwd(params, *a))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(params, *a)
    _ = float(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": "VQA eval forward (device-resident inputs)",
        "value": round(args.batch / dt, 1),
        "unit": f"pairs/sec/chip (b{args.batch} seq{args.seq} "
                f"r{args.regions} "
                f"{args.quantize or 'bf16'})",
        "ms_per_call": round(dt * 1000, 2)}), flush=True)


if __name__ == "__main__":
    main()
