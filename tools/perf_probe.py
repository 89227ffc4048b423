#!/usr/bin/env python
"""Backward-pass ablation probe on real hardware (VERDICT #3).

Splits the headline VQA train step (b256 seq23 37r bf16) into
  fwd-train (dropout) | fwd+bwd | fwd-eval | full step (+AdamW)
and compares remat variants, printing one JSON line each.

Platform caveats (axon remote TPU): the batch is device_put once and
passed as jit ARGUMENTS (embedded jaxpr constants re-upload per call
here), and the FIRST timed program of a process pays a multi-second
per-call penalty — hence fwd_train leads and fwd_eval runs last.
full_step_ms (donated, fused train step) is the ground-truth number;
the sub-probes are for relative A/B only (their dispatch pipelines
differ — fwd_bwd is an undonated grad probe and times slower than the
full fused step). For absolute eval-forward throughput use
tools/bench_eval_forward.py.

Usage (single TPU process): python tools/perf_probe.py [--iters 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, sync, iters):
    fn()  # compile
    sync()
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--variants", nargs="*", default=["base", "remat_ff"])
    p.add_argument("--full_only", action="store_true",
                   help="skip the fwd/bwd sub-probes (3 remote compiles per "
                        "variant) — for variants that only change the "
                        "optimizer/update, full_step_ms is the whole story")
    p.add_argument("--trace", default=None,
                   help="capture a jax.profiler trace of the timed full-step "
                        "loop into this directory (first variant only); "
                        "analyze with tools/analyze_trace.py")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    from volta_tpu.models import VoltaForVLTasks
    from volta_tpu.optimization import build_optimizer, warmup_linear_schedule
    from volta_tpu.parallel import (create_train_state, make_mesh,
                                    make_task_train_step, shard_batch)
    from __graft_entry__ import _flagship, _task_cfg, _vqa_batch

    b, l, k = 256, 23, 37
    task_cfg = _task_cfg()
    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)

    if args.full_only:
        # absorb the first-timed-program per-call penalty (CLAUDE.md: the
        # first program of a process times 3-16 s/call regardless of its
        # actual cost) on a throwaway matmul instead of the measurement
        warm = jax.jit(lambda a: (a @ a).sum())
        wx = jnp.ones((512, 512), jnp.bfloat16)
        for _ in range(10):
            float(warm(wx))

    from volta_tpu.ops import pallas_attention as _pa_mod

    from volta_tpu.models import layers as _layers_mod

    _orig_int_threshold_dropout = _layers_mod.int_threshold_dropout
    _orig_layer_norm_ref = _layers_mod.layer_norm_ref

    for variant in args.variants:
        _pa_mod.NAT_BATCHED_HEADS[0] = True  # module defaults; variants leak
        _layers_mod.GELU_UPCAST[0] = True
        _layers_mod.GELU_BF16_TANH[0] = True
        _layers_mod.int_threshold_dropout = _orig_int_threshold_dropout
        _layers_mod.layer_norm_ref = _orig_layer_norm_ref
        cfg = _flagship()
        tx_override = None
        if variant == "remat_ff":
            cfg.remat_ff = True
        elif variant == "nodrop":
            # perf ablation: how much do the hidden-dropout masks cost?
            cfg.hidden_dropout_prob = 0.0
            cfg.v_hidden_dropout_prob = 0.0
        elif variant == "noattndrop":
            # perf ablation: XLA attention instead of the in-kernel-dropout
            # Pallas kernel (rate 0 keeps the fused eval kernel on)
            cfg.attention_probs_dropout_prob = 0.0
            cfg.v_attention_probs_dropout_prob = 0.0
        elif variant == "no_ln":
            # perf ablation (numerics wrong on purpose): LayerNorm -> identity
            from volta_tpu.models import layers as _layers

            _layers.layer_norm_ref = \
                lambda x, scale, bias, eps=_layers.LN_EPS: x
        elif variant == "xla_attn":
            # perf ablation: XLA einsum attention everywhere
            cfg.use_pallas = False
        elif variant == "no_pmask":
            # A/B: XLA RngBitGenerator bernoulli instead of the Pallas
            # keep-mask kernel (measured: pmask 91.4 vs bernoulli 92.3)
            cfg.use_pallas_dropout_mask = False
            cfg.use_hash_dropout = False
        elif variant == "pmask":
            cfg.use_pallas_dropout_mask = True
            cfg.use_hash_dropout = False
        elif variant == "no_hash":
            # A/B: default hash dropout off -> RngBitGenerator bernoulli
            cfg.use_hash_dropout = False
        elif variant == "fixedmask":
            # diagnostic (wrong numerics): hidden dropout with a constant
            # iota-derived mask — no RNG draw, same mask traffic + where.
            # fixedmask ~= nodrop  -> the RNG generation is the cost;
            # fixedmask ~= base    -> mask traffic/fusion breaks are.
            # (measured: 88.2 vs nodrop 84.8 vs rbg-bernoulli 92.3)
            cfg.use_pallas_dropout_mask = False
            cfg.use_hash_dropout = False  # route through the patched fn
            from volta_tpu.models import layers as _layers

            def _fake_dropout(x, key, rate):
                idx = jax.lax.broadcasted_iota(jnp.uint32, x.shape,
                                               x.ndim - 1)
                keep = ((idx * jnp.uint32(2654435761)) & 255) >= \
                    jnp.uint32(rate * 256)
                return jnp.where(keep, x / (1.0 - rate),
                                 jnp.zeros((), x.dtype))

            _layers.int_threshold_dropout = _fake_dropout
        elif variant == "hm":
            # A/B: enable the (default-off, measured 95.9 vs 92.8 ms)
            # in-kernel hidden-dropout mask piggyback
            cfg.fuse_hidden_dropout = True
        elif variant == "natattn":
            # natural-layout kernels are the config default now; kept so old
            # invocations still run (a no-op vs base)
            cfg.attn_natural_layout = True
        elif variant == "hmattn":
            # A/B: back to the head-major [H,B,L,D] kernels (XLA layout
            # copies around every attention site; measured 84.71 ms)
            cfg.attn_natural_layout = False
        elif variant == "natbh":
            # A/B: nat kernels with ONE bt*H-batched dot_general per matmul
            # (in-VMEM head marshalling) vs the unrolled per-head loop
            from volta_tpu.ops import pallas_attention as _pa
            _pa.NAT_BATCHED_HEADS[0] = True
        elif variant == "natloop":
            # A/B: back to the unrolled per-head nat kernel bodies
            from volta_tpu.ops import pallas_attention as _pa
            _pa.NAT_BATCHED_HEADS[0] = False
        elif variant == "gelu_bf16":
            # A/B: the pre-round-3 bf16 erf gelu (bf16 erf lowers ~4x
            # slower than f32 erf on v5e — tools/matmul_roofline.py;
            # measured full_step 72.23 vs tanh default 69.08)
            _layers_mod.GELU_BF16_TANH[0] = False
            _layers_mod.GELU_UPCAST[0] = False
        elif variant == "gelu_erf32":
            # A/B: exact erf through an f32 sandwich (measured full_step
            # 72.14 ~= bf16 erf's 72.23 — in the real step the forward
            # erf hides behind other work; only tanh moves the step)
            _layers_mod.GELU_BF16_TANH[0] = False
        elif variant == "gelu_tanh":
            # the sub-f32 default since the A/B above; kept as an explicit
            # variant name (a no-op vs base)
            cfg.hidden_act = "gelu_tanh"
            cfg.v_hidden_act = "gelu_tanh"
        elif variant == "fused_resln":
            # A/B: enable the (default-off) fused dropout+residual+LN train
            # kernel against the XLA-composition base
            cfg.use_fused_residual_ln = True
        elif variant == "opt_sgd":
            # diagnostic (wrong training): plain SGD, no clip — isolates the
            # whole clip+AdamW-update share of the step (m/v traffic + clip
            # pass; HBM floor est. ~4 ms at 112M fp32 params)
            import optax as _optax

            tx_override = _optax.sgd(1e-3)
        elif variant == "opt_noclip":
            # A/B: drop the global-norm clip pass (one extra read of every
            # grad + a scalar reduce before the update can start)
            tx_override = "noclip"
        elif variant == "opt_mv_bf16":
            # A/B: AdamW moments stored bf16 (opt-in state_dtype) — halves
            # the m/v HBM traffic (4 x 448 MB/step -> 2 x)
            tx_override = "mv_bf16"
        model = VoltaForVLTasks(cfg, task_cfg, ("TASK1",))
        batch = _vqa_batch(cfg, b, l, k)
        params = jax.jit(lambda r: model.init(
            r, batch["question"], batch["features"], batch["spatials"],
            "TASK1", batch["segment_ids"], batch["input_mask"],
            batch["image_mask"]))(jax.random.PRNGKey(0))["params"]
        sharded = shard_batch(mesh, batch)

        # the batch ships to HBM ONCE and is passed as jit arguments —
        # embedding it as jaxpr constants makes the sub-probe timings
        # transport artifacts on this platform (constants re-upload)
        dev = {kk: jax.device_put(jnp.asarray(vv))
               for kk, vv in batch.items()}
        dargs = (dev["question"], dev["features"], dev["spatials"],
                 dev["segment_ids"], dev["input_mask"], dev["image_mask"],
                 dev["target"])

        def fwd(params, deterministic, rng, q_, f_, s_, seg_, im_, vm_,
                tgt):
            pred, _ = model.apply(
                {"params": params}, q_, f_, s_, "TASK1", seg_, im_, vm_,
                deterministic=deterministic,
                rngs=None if deterministic else {"dropout": rng})
            per = jnp.maximum(pred, 0) - pred * tgt + \
                jnp.log1p(jnp.exp(-jnp.abs(pred)))
            return jnp.mean(per)

        rng = jax.random.PRNGKey(2)

        @jax.jit
        def fwd_eval(p, q_, f_, s_, seg_, im_, vm_, tgt):
            return fwd(p, True, rng, q_, f_, s_, seg_, im_, vm_, tgt)

        @jax.jit
        def fwd_train(p, q_, f_, s_, seg_, im_, vm_, tgt):
            return fwd(p, False, rng, q_, f_, s_, seg_, im_, vm_, tgt)

        @jax.jit
        def grad_fn(p, q_, f_, s_, seg_, im_, vm_, tgt):
            g = jax.grad(lambda q: fwd(q, False, rng, q_, f_, s_, seg_,
                                       im_, vm_, tgt))(p)
            return jax.tree_util.tree_leaves(g)[0].ravel()[0]

        sched = warmup_linear_schedule(4e-5, 100, 1e4)
        if tx_override is None:
            tx = build_optimizer("adamw", sched, params, clip_norm=1.0)
        elif tx_override == "noclip":
            tx = build_optimizer("adamw", sched, params, clip_norm=None)
        elif tx_override == "mv_bf16":
            tx = build_optimizer("adamw", sched, params, clip_norm=1.0,
                                 state_dtype=jnp.bfloat16)
        else:
            tx = tx_override
        state = create_train_state(jax.random.PRNGKey(1), params, tx)
        step = make_task_train_step(model, tx, task_cfg, "TASK1", mesh=mesh)

        sync = lambda x=None: (float(x) if x is not None else None)
        res = {}
        if not args.full_only:
            res["fwd_train_ms"] = timeit(
                lambda: fwd_train(params, *dargs), sync, args.iters)
            res["fwd_bwd_ms"] = timeit(
                lambda: grad_fn(params, *dargs), sync, args.iters)
            res["fwd_eval_ms"] = timeit(
                lambda: fwd_eval(params, *dargs), sync, args.iters)

        holder = {"s": state}

        def one_step():
            holder["s"], m = step(holder["s"], sharded)
            return m

        m = one_step()  # compile + donation warmup
        float(m["loss"])
        m = one_step()
        float(m["loss"])
        tracing = args.trace and variant == args.variants[0]
        if tracing:
            jax.profiler.start_trace(args.trace)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            m = one_step()
        float(m["loss"])
        res["full_step_ms"] = (time.perf_counter() - t0) / args.iters * 1000
        if tracing:
            jax.profiler.stop_trace()
        res["pairs_per_sec"] = round(b / res["full_step_ms"] * 1000, 1)
        print(json.dumps({"variant": variant,
                          **{k2: round(v, 2) for k2, v in res.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
