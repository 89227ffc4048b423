#!/usr/bin/env python
"""Pretrain on Conceptual Captions (MLM + masked-region + ITM).

reference: train_concap.py. One jitted pretraining step over the device
mesh; per-host LMDB shards or strided sharding of a single environment;
Orbax checkpoints with auto-resume.
"""

import argparse
import logging
import os

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
logger = logging.getLogger(__name__)


def parse_args():
    p = argparse.ArgumentParser()
    # Model
    p.add_argument("--from_pretrained", default="", type=str)
    p.add_argument("--bert_model", default="bert-base-uncased", type=str)
    p.add_argument("--config_file", default="configs/ctrl_uniter_base.json",
                   type=str)
    p.add_argument("--resume_file", default="", type=str)
    # Data
    p.add_argument("--annotations_path", default="datasets/conceptual_caption/annotations",
                   type=str)
    p.add_argument("--features_path", default="datasets/conceptual_caption/imgfeats/volta",
                   type=str)
    # Output
    p.add_argument("--output_dir", default="save", type=str)
    p.add_argument("--logdir", default="logs", type=str)
    p.add_argument("--save_name", default="", type=str)
    # Text
    p.add_argument("--do_lower_case", action="store_true", default=True)
    p.add_argument("--vocab_file", default="", type=str)
    p.add_argument("--max_seq_length", default=36, type=int)
    # Training
    p.add_argument("--train_batch_size", default=512, type=int)
    p.add_argument("--learning_rate", default=1e-4, type=float)
    p.add_argument("--num_train_epochs", default=10, type=int)
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--gradient_accumulation_steps", dest="grad_acc_steps",
                   type=int, default=1)
    p.add_argument("--max_region_num", default=36, type=int)
    # Objective: 0 = all losses; 1 = mask MLM/MRM on mismatched pairs;
    # 2 = no ITM (reference: train_concap.py:279-295)
    p.add_argument("--objective", default=0, type=int)
    # Scheduler
    p.add_argument("--warmup_proportion", default=0.1, type=float)
    p.add_argument("--warmup_steps", default=None, type=float,
                   help="overrides --warmup_proportion "
                        "(reference: train_concap.py:79-81)")
    # Seed / workers
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--num_worker_procs", type=int, default=0,
                   help="forked decode processes (multi-core hosts)")
    p.add_argument("--in_memory", default=False, type=bool,
                   help="packed in-RAM store: decode the LMDB once, "
                        "assemble batches by vectorised gathers")
    # Optimization
    p.add_argument("--adam_epsilon", default=1e-6, type=float)
    p.add_argument("--optimizer_state_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype for the AdamW moments (bfloat16 "
                        "halves their HBM traffic, ~1 ms/step at base "
                        "scale; moments still update in float32)")
    p.add_argument("--adam_betas", default=(0.9, 0.98), nargs="+",
                   type=float,
                   help="AdamW betas (reference: train_concap.py:101)")
    p.add_argument("--skip_disconnected_params", action="store_true",
                   help="torch-exact handling of loss-disconnected params "
                        "(grad None there, e.g. image heads whose visual "
                        "objective weight is 0): no update AND no decay "
                        "(see optimization.skip_disconnected)")
    p.add_argument("--trunk_lr_scale", default=1.0, type=float,
                   help="LR multiplier for params loaded from "
                        "--from_pretrained (the reference's intended 0.1x "
                        "trunk rule, train_concap.py:213-224 — dead code "
                        "there as shipped, so 1.0 = reference behavior)")
    p.add_argument("--weight_decay", default=0.01, type=float)
    p.add_argument("--clip_grad_norm", default=0.0, type=float)
    # TPU-native extras
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--profile_steps", default=0, type=int,
                   help="capture a jax.profiler trace over N steps")
    p.add_argument("--debug_nans", action="store_true")
    p.add_argument("--prng_impl", default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="dropout PRNG; rbg is ~15%% faster per step on TPU")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "(coordinator from env, one process per host)")
    p.add_argument("--nce_shared_negatives", action="store_true",
                   help="opt-in TPU-native NCE scheme: one shared set of "
                        "cross-batch negatives per step (plus the "
                        "reference's per-query in-batch draws) — removes "
                        "the all-pairs score matmul + giant gather that "
                        "make the reference-sampled NCE 26%% slower than "
                        "kl; NOT sampling-parity with the reference "
                        "(see volta_tpu/losses._NCE_SHARED_NEGATIVES)")
    p.add_argument("--steps_per_epoch", default=0, type=int,
                   help="cap steps per epoch (debug)")
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    if args.nce_shared_negatives:
        from volta_tpu import losses

        losses._NCE_SHARED_NEGATIVES[0] = True

    from volta_tpu.checkpoint import (from_pretrained, latest_step,
                                      restore_train_state, save_train_state)
    from volta_tpu.config import VoltaConfig
    from volta_tpu.data.datasets.concap import make_concap_loader
    from volta_tpu.models import VoltaForVLPreTraining
    from volta_tpu.optimization import build_optimizer, warmup_linear_schedule
    from volta_tpu.parallel import (create_train_state, make_mesh,
                                    make_pretrain_step, replicated,
                                    shard_batch)
    from volta_tpu.parallel.mesh import data_parallel_size
    from volta_tpu.task_utils import make_tokenizer
    from volta_tpu.train_utils import (MetricsLogger, fetch_metric_window,
                                       host_schedule, save_command, set_seed,
                                       summary_parameters)

    import jax as _jax
    if args.distributed:
        _jax.distributed.initialize()
    _jax.config.update("jax_default_prng_impl", args.prng_impl)
    if args.debug_nans:
        from volta_tpu.utils.profiling import enable_nan_debugging
        enable_nan_debugging()
    set_seed(args.seed)
    cfg = VoltaConfig.from_json_file(args.config_file)
    cfg.compute_dtype = args.compute_dtype
    cfg.objective = args.objective
    if args.no_pallas:
        cfg.use_pallas = False

    run_name = f"{os.path.basename(args.config_file)}-" \
        f"{args.save_name or 'pretrained'}"
    output_dir = os.path.join(args.output_dir, run_name)
    tb = MetricsLogger(os.path.join(args.logdir, run_name))
    save_command(output_dir, args, cfg)

    tokenizer = make_tokenizer(args.bert_model, args.do_lower_case,
                               args.vocab_file)
    n_hosts = jax.process_count()
    per_host_batch = args.train_batch_size // args.grad_acc_steps // n_hosts
    train_ds, train_loader = make_concap_loader(
        args.features_path, args.annotations_path, tokenizer,
        split="train", seq_len=args.max_seq_length,
        region_len=args.max_region_num, batch_size=per_host_batch,
        num_workers=args.num_workers, objective=args.objective,
        num_locs=cfg.num_locs, add_global_imgfeat=cfg.add_global_imgfeat,
        seed=args.seed, num_shards=n_hosts, shard_index=jax.process_index(),
        num_procs=args.num_worker_procs, packed=args.in_memory,
        feat_dtype=("bfloat16" if args.compute_dtype == "bfloat16"
                    else "float32"))
    try:
        _, val_loader = make_concap_loader(
            args.features_path, args.annotations_path, tokenizer,
            split="valid", seq_len=args.max_seq_length,
            region_len=args.max_region_num, batch_size=per_host_batch,
            num_workers=2, objective=args.objective, num_locs=cfg.num_locs,
            add_global_imgfeat=cfg.add_global_imgfeat, seed=args.seed)
    except (FileNotFoundError, ValueError):
        val_loader = None

    model = VoltaForVLPreTraining(cfg)
    sample = next(iter(train_loader))
    params = jax.jit(lambda r: model.init(
        r, sample["input_ids"], sample["image_feat"], sample["image_loc"],
        sample["segment_ids"], sample["input_mask"],
        sample["image_mask"]))(jax.random.PRNGKey(args.seed))["params"]
    lr_scales = None
    if args.trunk_lr_scale != 1.0 and not args.from_pretrained:
        raise SystemExit("--trunk_lr_scale scales the params loaded from "
                         "--from_pretrained, which was not given")
    if args.from_pretrained:
        loaded, report = from_pretrained(cfg, {"params": params},
                                         args.from_pretrained)
        params = loaded["params"]
        logger.info("loaded %d tensors, %d left at init",
                    len(report["loaded"]), len(report["skipped"]))
        if args.trunk_lr_scale != 1.0:
            # the reference's INTENDED rule (train_concap.py:213-224, dead
            # as shipped — see optimization.scale_updates_by): params that
            # came from the checkpoint train at trunk_lr_scale * lr
            if report["loaded"] and report["loaded"][0].startswith("<"):
                raise SystemExit(
                    "--trunk_lr_scale needs a torch .bin checkpoint (the "
                    "importer must enumerate which params were loaded); "
                    f"got {report['loaded'][0]}")
            from volta_tpu.optimization import lr_scales_from_loaded
            lr_scales = lr_scales_from_loaded(
                params, report["loaded"], args.trunk_lr_scale)
    summary_parameters(params)

    steps_per_epoch = len(train_loader)
    if args.steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.steps_per_epoch)
    total = max(1, steps_per_epoch * args.num_train_epochs)
    warmup = int(args.warmup_steps) if args.warmup_steps else \
        int(total * args.warmup_proportion)
    sched = warmup_linear_schedule(args.learning_rate, warmup, total)
    lr_of = host_schedule(sched)
    tx = build_optimizer("adamw", sched, params,
                         weight_decay=args.weight_decay,
                         clip_norm=args.clip_grad_norm or None,
                         grad_accum_steps=args.grad_acc_steps,
                         betas=args.adam_betas, eps=args.adam_epsilon,
                         state_dtype=None
                         if args.optimizer_state_dtype == "float32"
                         else jax.numpy.bfloat16,
                         lr_scales=lr_scales,
                         skip_disconnected_params=args.skip_disconnected_params)

    mesh = make_mesh(n_data=data_parallel_size(per_host_batch))
    state = create_train_state(jax.random.PRNGKey(args.seed + 1), params, tx)
    state = jax.device_put(state, replicated(mesh))
    del params

    ckpt_dir = os.path.join(output_dir, "ckpt")
    start_epoch = args.start_epoch
    if args.resume_file and os.path.isfile(args.resume_file):
        from volta_tpu.checkpoint import resume_from_torch_tar
        state, info = resume_from_torch_tar(cfg, state, args.resume_file)
        start_epoch = info["epoch_id"] + 1 if info["epoch_id"] >= 0 \
            else int(info["global_step"]) // max(steps_per_epoch, 1)
        if info["hyperparams"]:
            logger.info("tar optimizer hyperparams (verify CLI flags "
                        "match): %s", info["hyperparams"])
        logger.info("resumed from torch tar at step %d (epoch %d)",
                    info["global_step"], start_epoch)
    elif args.resume_file or latest_step(ckpt_dir) is not None:
        state, step = restore_train_state(args.resume_file or ckpt_dir, state)
        start_epoch = int(step) // max(steps_per_epoch, 1)
        logger.info("resumed from step %d (epoch %d)", step, start_epoch)

    from volta_tpu.parallel.train_step import make_pretrain_eval_step
    step_fn = make_pretrain_step(model, tx, cfg, objective=args.objective,
                                 mesh=mesh)
    eval_fn = make_pretrain_eval_step(model, cfg, mesh=mesh)


    # Preemption tolerance: checkpoint on SIGTERM and exit cleanly; the next
    # launch auto-resumes from the latest step (SURVEY §5.3 plan).
    import signal

    _preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        _preempted["flag"] = True

    signal.signal(signal.SIGTERM, _on_sigterm)
    global_step = int(state.step)
    pending = []
    for epoch in range(start_epoch, args.num_train_epochs):
        train_ds.set_epoch(epoch)
        train_loader.set_epoch(epoch)
        for i, batch in enumerate(train_loader):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            if args.profile_steps and global_step == 20 and \
                    jax.process_index() == 0:
                jax.profiler.start_trace(os.path.join(args.logdir, run_name))
            state, m = step_fn(state, shard_batch(mesh, batch))
            global_step += 1
            pending.append((global_step, m))
            if _preempted["flag"]:
                if jax.process_index() == 0:
                    save_train_state(ckpt_dir, global_step, state)
                logger.info("preempted: checkpointed at step %d", global_step)
                return
            if args.profile_steps and \
                    global_step == 20 + args.profile_steps and \
                    jax.process_index() == 0:
                float(m["loss"])
                jax.profiler.stop_trace()
            if len(pending) >= 20:
                # ONE fused device transfer per window (see
                # train_utils.fetch_metric_window) + host-side lr
                for gs, mt, mv, itm in fetch_metric_window(
                        pending, ("masked_t", "masked_v", "itm")):
                    tb.step_train_cc(epoch, gs, mt, mv, itm, lr_of(gs))
                pending.clear()
                tb.show_train_cc(epoch, global_step)

        if val_loader is not None:
            vals = []
            for batch in val_loader:
                m = eval_fn(state.params, shard_batch(mesh, batch))
                vals.append((0, m))  # fetched in one fused transfer below
            vals = [v for _, v in fetch_metric_window(vals, ("loss",))]
            logger.info("epoch %d val loss %.4f", epoch,
                        float(np.mean(vals)) if vals else float("nan"))
        if jax.process_index() == 0:
            save_train_state(ckpt_dir, global_step, state)
    tb.close()


if __name__ == "__main__":
    main()
