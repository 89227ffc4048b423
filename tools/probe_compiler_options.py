#!/usr/bin/env python
"""Per-compile XLA compiler-option A/B on the headline step.

Client-set XLA_FLAGS die at env-parse time in this sandbox (the local
plugin's flag table has no TPU compiler flags -> parse_flags_from_env
aborts the process, logs/xlaflags_ab_r3.log). JAX's AOT path sends
`compiler_options` INSIDE the compile request instead, which is the
only way TPU-side knobs can reach the axon remote compiler from here.

Stage 1 (--tiny, default): compile a tiny matmul with each candidate
option and report accepted/rejected — cheap, answers "does the
transport forward these at all?".
Stage 2 (--full): A/B the flagship b256 VQA train step under each
accepted option set (one compile each, minutes on the remote compiler).

Usage (single TPU process): python tools/probe_compiler_options.py [--full]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANDIDATES = [
    ("base", {}),
    # vmem32m/vmem64m measured in round 3 and lost (69.47/70.14 vs base
    # 69.09 ms, logs/compopts_full_r3.log) — dropped from the grid.
    # scheduler / fusion knobs — stage 1 just asks whether the remote
    # compiler accepts them; only accepted ones are worth a full A/B
    ("lhs_off", {"xla_latency_hiding_scheduler_rerun": "0"}),
    ("no_rwb", {"xla_tpu_rwb_fusion": "false"}),
    ("flash_attn", {"xla_tpu_enable_flash_attention": "true"}),
    ("async_host", {"xla_tpu_enable_async_host_transfer": "true"}),
    ("vmem_compute", {"xla_tpu_use_compute_vmem_limit": "true"}),
]


def try_tiny(opts):
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256), jnp.bfloat16)

    def f(a):
        return (a @ a).sum()

    try:
        c = jax.jit(f).lower(x).compile(compiler_options=opts or None)
        val = float(c(x))
        return True, val
    except Exception as e:  # noqa: BLE001 - report any rejection verbatim
        return False, f"{type(e).__name__}: {e}"


def full_step(opts, iters):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    from volta_tpu.models import VoltaForVLTasks
    from volta_tpu.optimization import build_optimizer, warmup_linear_schedule
    from volta_tpu.parallel import (create_train_state, make_mesh,
                                    make_task_train_step, shard_batch)
    from __graft_entry__ import _flagship, _task_cfg, _vqa_batch

    b, l, k = 256, 23, 37
    cfg = _flagship()
    task_cfg = _task_cfg()
    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    model = VoltaForVLTasks(cfg, task_cfg, ("TASK1",))
    batch = _vqa_batch(cfg, b, l, k)
    params = jax.jit(lambda r: model.init(
        r, batch["question"], batch["features"], batch["spatials"],
        "TASK1", batch["segment_ids"], batch["input_mask"],
        batch["image_mask"]))(jax.random.PRNGKey(0))["params"]
    tx = build_optimizer("adamw", warmup_linear_schedule(4e-5, 100, 1e4),
                         params, clip_norm=1.0)
    state = create_train_state(jax.random.PRNGKey(1), params, tx)
    step = make_task_train_step(model, tx, task_cfg, "TASK1", mesh=mesh,
                                compiler_options=opts or None)
    sharded = shard_batch(mesh, batch)

    s = state
    s, m = step(s, sharded)
    float(m["loss"])
    s, m = step(s, sharded)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        s, m = step(s, sharded)
    float(m["loss"])
    ms = (time.perf_counter() - t0) / iters * 1000
    return {"full_step_ms": round(ms, 2),
            "pairs_per_sec": round(b / ms * 1000, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true")
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    for tag, opts in CANDIDATES:
        ok, info = try_tiny(opts)
        print(json.dumps({"stage": "tiny", "variant": tag,
                          "accepted": ok, "info": info}), flush=True)
        if not ok and tag == "base":
            return  # AOT path itself broken; nothing to probe
    if not args.full:
        return
    for tag, opts in CANDIDATES:
        try:
            res = full_step(opts, args.iters)
        except Exception as e:  # noqa: BLE001
            res = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({"stage": "full", "variant": tag, **res}),
              flush=True)


if __name__ == "__main__":
    main()
