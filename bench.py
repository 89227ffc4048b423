"""Headline benchmark: ctrl_uniter VQA fine-tuning throughput.

Workload (reference shapes, BASELINE.md): global batch 256, text len 23,
36+1 regions, BERT-base-scale single-stream encoder (24 sublayers), full
forward+backward+AdamW update, bf16 compute / fp32 params.

Prints ONE JSON line:
  {"metric": ..., "value": pairs/sec/chip, "unit": ..., "vs_baseline": ...}

Baseline: the reference publishes no throughput (SURVEY.md §6). Estimate for
its training config (fp32 PyTorch 1.4, no AMP — apex amp is never enabled in
the training scripts): ~30.6 GFLOP/pair train cost at these shapes; A100
fp32 (19.5 TFLOPs peak, ~40% utilisation for BERT-base at seq 60)
≈ 250 pairs/sec. vs_baseline = value / 250. The ≥3x north star is
vs_baseline ≥ 3.
"""

import json
import time

import numpy as np

A100_REF_PAIRS_PER_SEC = 250.0


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    from volta_tpu.models import VoltaForVLTasks
    from volta_tpu.optimization import build_optimizer, warmup_linear_schedule
    from volta_tpu.parallel import (create_train_state, make_mesh,
                                    make_task_train_step, shard_batch)
    from __graft_entry__ import _flagship, _task_cfg, _vqa_batch

    cfg = _flagship()            # ctrl_uniter_base, bf16 compute
    task_cfg = _task_cfg()       # VQA: 3129-way soft classifier
    model = VoltaForVLTasks(cfg, task_cfg, ("TASK1",))

    b, l, k = 256, 23, 37
    batch = _vqa_batch(cfg, b, l, k)

    params = jax.jit(lambda r: model.init(
        r, batch["question"], batch["features"], batch["spatials"], "TASK1",
        batch["segment_ids"], batch["input_mask"], batch["image_mask"]))(
        jax.random.PRNGKey(0))["params"]

    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev, n_model=1)
    tx = build_optimizer("adamw", warmup_linear_schedule(4e-5, 100, 10000),
                         params, clip_norm=1.0)
    state = create_train_state(jax.random.PRNGKey(1), params, tx)
    state = jax.device_put(state, jax.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    step = make_task_train_step(model, tx, task_cfg, "TASK1", mesh=mesh)
    sharded = shard_batch(mesh, batch)

    # compile + warmup (two calls: donation changes buffer layouts once)
    state, m = step(state, sharded)
    float(m["loss"])
    state, m = step(state, sharded)
    float(m["loss"])

    # NOTE: a device_get (float()) is the sync point — block_until_ready is
    # not reliable on the experimental remote-TPU platform.
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, sharded)
    _ = float(m["loss"])  # forces the whole chain
    dt = time.perf_counter() - t0

    pairs_per_sec = b * iters / dt
    per_chip = pairs_per_sec / n_dev
    print(json.dumps({
        "metric": "ctrl_uniter VQA fine-tune throughput",
        "value": round(per_chip, 2),
        "unit": "image-text pairs/sec/chip (batch 256, seq 23, 37 regions, "
                "bf16 train step incl. AdamW)",
        "vs_baseline": round(per_chip / A100_REF_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
