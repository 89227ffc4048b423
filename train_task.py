#!/usr/bin/env python
"""Fine-tune a V&L model on one downstream task.

CLI-compatible with the reference trainer (reference: train_task.py:41-110):
same flags, same config/*.json and config_tasks/*.yml schemas. TPU-native
internals: one jitted train step over the device mesh (data-parallel psum on
ICI), Orbax checkpoints, bf16 compute.

Example:
  python train_task.py --config_file configs/ctrl_uniter_base.json \
      --from_pretrained ckpt.bin --tasks_config_file \
      config_tasks/ctrl_trainval_tasks.yml --task 1 --output_dir out
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
    # Output
    p.add_argument("--output_dir", default="save", type=str)
    p.add_argument("--logdir", default="logs", type=str)
    p.add_argument("--save_name", default="", type=str)
    # Task
    p.add_argument("--tasks_config_file",
                   default="config_tasks/ctrl_trainval_tasks.yml", type=str)
    p.add_argument("--task", default="1", type=str)
    # Text
    p.add_argument("--do_lower_case", action="store_true", default=True)
    p.add_argument("--vocab_file", default="", type=str,
                   help="local vocab.txt for the self-contained tokenizer")
    # Training
    p.add_argument("--num_train_epochs", default=20, type=int)
    p.add_argument("--gradient_accumulation_steps", dest="grad_acc_steps",
                   type=int, default=1)
    p.add_argument("--drop_last", action="store_true")
    p.add_argument("--eval_period", default=1, type=int,
                   help="evaluate every N epochs")
    # Scheduler
    p.add_argument("--lr_scheduler", default="warmup_linear", type=str)
    p.add_argument("--warmup_proportion", default=0.1, type=float)
    p.add_argument("--warmup_steps", default=None, type=float)
    # Seed / workers
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--in_memory", default=False, type=bool)
    p.add_argument("--num_worker_procs", type=int, default=0,
                   help="forked decode processes (multi-core hosts)")
    p.add_argument("--device_store", action="store_true",
                   help="keep packed features in device HBM; ship indices "
                        "+ sparse targets per step (implies --in_memory)")
    # Optimization
    p.add_argument("--optim", default="AdamW", type=str)
    p.add_argument("--adam_epsilon", default=1e-6, type=float)
    p.add_argument("--adam_betas", default=(0.9, 0.999), nargs="+",
                   type=float)
    p.add_argument("--adam_correct_bias", default=False, action="store_true")
    p.add_argument("--optimizer_state_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype for the AdamW moments (bfloat16 "
                        "halves their HBM traffic, ~1 ms/step at base "
                        "scale; moments still update in float32)")
    p.add_argument("--weight_decay", default=0.01, type=float)
    p.add_argument("--clip_grad_norm", default=0.0, type=float)
    p.add_argument("--skip_disconnected_params", action="store_true",
                   help="torch-exact handling of loss-disconnected params "
                        "(grad None there, e.g. LXMERT's post-cross vision "
                        "tail in fine-tuning): no update AND no decay, "
                        "instead of decaying zero-grad params (see "
                        "optimization.skip_disconnected)")
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
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    from volta_tpu.checkpoint import (from_pretrained, latest_step,
                                      restore_train_state, save_train_state)
    from volta_tpu.config import VoltaConfig
    from volta_tpu.models import VoltaForVLTasks
    from volta_tpu.optimization import SCHEDULES, build_optimizer
    from volta_tpu.parallel import (create_train_state, make_mesh,
                                    make_task_eval_step,
                                    make_task_train_step, replicated,
                                    shard_batch)
    from volta_tpu.parallel.mesh import data_parallel_size
    from volta_tpu.task_utils import load_dataset, load_task_config, task_key
    from volta_tpu.train_utils import (MetricsLogger, apply_freeze,
                                       fetch_metric_window, host_schedule,
                                       save_command, set_seed,
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
    if "roberta" in args.bert_model:
        cfg.model = "roberta"
    cfg.compute_dtype = args.compute_dtype
    if args.no_pallas:
        cfg.use_pallas = False
    task_cfg = load_task_config(args.tasks_config_file)
    task = task_key(args.task)
    tc = task_cfg[task]
    if tc.get("fusion_method"):
        # per-task pooling override, e.g. vl-bert_vqa [MASK]-position
        # pooling for VL-BERT VQA (reference: train_task.py:144-146)
        cfg.fusion_method = tc["fusion_method"]

    save_name = args.save_name or "base"
    run_name = f"{tc['name']}_{os.path.basename(args.config_file)}-{save_name}"
    output_dir = os.path.join(args.output_dir, run_name)
    tb = MetricsLogger(os.path.join(args.logdir, run_name))
    save_command(output_dir, args, cfg)

    data = load_dataset(args, cfg, task_cfg, args.task)
    train_loader = data["train_loader"]
    val_loader = data.get("val_loader")
    if "num_labels" not in tc and hasattr(data["train_dataset"], "num_labels"):
        tc["num_labels"] = data["train_dataset"].num_labels

    model = VoltaForVLTasks(cfg, task_cfg, (task,))

    # init params from one example batch
    sample = next(iter(train_loader))
    from volta_tpu.task_utils import process_batch
    inputs, _ = process_batch(tc, {k: np.asarray(v)
                                   for k, v in sample.items()})
    params = jax.jit(lambda r: model.init(
        r, inputs["input_ids"], inputs["image_feat"], inputs["image_loc"],
        task, inputs["token_type_ids"], inputs["attention_mask"],
        inputs["image_attention_mask"]))(
        jax.random.PRNGKey(args.seed))["params"]

    if args.from_pretrained:
        params, report = from_pretrained(cfg, {"params": params},
                                         args.from_pretrained)
        params = params["params"]
        logger.info("loaded %d tensors, %d left at init",
                    len(report["loaded"]), len(report["skipped"]))
    if tc.get("embed_clf"):
        # initialise the classifier from answer word embeddings
        # (reference: train_task.py:182-202)
        from volta_tpu.train_utils import init_classifier_from_answers
        params = init_classifier_from_answers(
            params, task, data["train_dataset"])
    summary_parameters(params)

    steps_per_epoch = len(train_loader) // args.grad_acc_steps
    total_steps = max(1, steps_per_epoch * args.num_train_epochs)
    warmup = int(args.warmup_steps) if args.warmup_steps is not None else \
        int(total_steps * args.warmup_proportion)
    sched = SCHEDULES[args.lr_scheduler](float(tc["lr"]), warmup, total_steps)

    opt_name = {"adamw": "adamw", "radam": "radam"}.get(
        args.optim.lower(), "adamw")
    tx = build_optimizer(opt_name, sched, params,
                         weight_decay=args.weight_decay,
                         clip_norm=args.clip_grad_norm or None,
                         grad_accum_steps=args.grad_acc_steps,
                         betas=tuple(args.adam_betas),
                         eps=args.adam_epsilon,
                         correct_bias=args.adam_correct_bias,
                         state_dtype=None
                         if args.optimizer_state_dtype == "float32"
                         else jax.numpy.bfloat16,
                         skip_disconnected_params=args.skip_disconnected_params)
    tx = apply_freeze(tx, params, cfg.fixed_layers)

    # nlvr doubles the row count inside the step, so any divisor of the
    # loader batch works for both
    mesh = make_mesh(n_data=data_parallel_size(data["batch_size"]))
    state = create_train_state(jax.random.PRNGKey(args.seed + 1), params, tx)
    state = jax.device_put(state, replicated(mesh))
    del params

    start_epoch = 0
    ckpt_dir = os.path.join(output_dir, "ckpt")
    if args.resume_file and os.path.isfile(args.resume_file):
        # the reference's mid-run bundle (pytorch_ckpt_latest.tar):
        # weights + optimizer moments + global_step
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
        src = args.resume_file or ckpt_dir
        state, step = restore_train_state(src, state)
        start_epoch = int(step) // max(steps_per_epoch, 1)
        logger.info("resumed from step %d (epoch %d)", step, start_epoch)

    store = None
    train_ds = data["train_dataset"]
    if args.device_store and hasattr(train_ds, "enable_device_store"):
        # keep the packed feature arrays resident in HBM; batches carry row
        # indices + sparse targets (see parallel/train_step.py). Wins when
        # the host->device link is slower than HBM gathers.
        train_ds.enable_device_store(
            feat_dtype=("bfloat16" if args.compute_dtype == "bfloat16"
                        else "float32"))
        store = jax.device_put(train_ds.device_store_arrays(),
                               replicated(mesh))
        logger.info("device-resident feature store: %.2f GiB in HBM",
                    sum(np.asarray(v).nbytes
                        for v in store.values()) / 2**30)
    train_step = make_task_train_step(model, tx, task_cfg, task, mesh=mesh,
                                      store=store)
    eval_step = make_task_eval_step(model, task_cfg, task, mesh=mesh)


    # Preemption tolerance: checkpoint on SIGTERM and exit cleanly; the next
    # launch auto-resumes from the latest step (SURVEY §5.3 plan).
    import signal

    _preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        _preempted["flag"] = True

    signal.signal(signal.SIGTERM, _on_sigterm)
    best_score = -1.0
    global_step = int(state.step)
    lr_of = host_schedule(sched)
    pending = []
    for epoch in range(start_epoch, args.num_train_epochs):
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            if args.profile_steps and global_step == 20 and \
                    jax.process_index() == 0:
                jax.profiler.start_trace(os.path.join(args.logdir, run_name))
            state, metrics = train_step(state, shard_batch(mesh, batch))
            global_step += 1
            pending.append((global_step, metrics))
            if _preempted["flag"]:
                if jax.process_index() == 0:
                    save_train_state(ckpt_dir, global_step, state)
                logger.info("preempted: checkpointed at step %d", global_step)
                return
            if args.profile_steps and \
                    global_step == 20 + args.profile_steps and \
                    jax.process_index() == 0:
                float(metrics["loss"])
                jax.profiler.stop_trace()
            # fetch metrics in windows and in ONE fused transfer — a
            # per-scalar device_get costs a round trip each and would
            # serialise host and device (~90 ms/step over a remote link)
            if len(pending) >= tb.period:
                for gs, loss, score in fetch_metric_window(
                        pending, ("loss", "score")):
                    tb.step_train(epoch, gs, loss, score, lr_of(gs), task)
                pending.clear()

        # validation + checkpointing per epoch
        if val_loader is not None and (epoch + 1) % args.eval_period == 0:
            # keep only the scalar device refs per batch — retaining the
            # whole output dict would pin every batch's [b, num_labels]
            # prediction buffer in HBM until the fused fetch below
            outs = []
            for batch in val_loader:
                out = eval_step(state.params, shard_batch(mesh, batch))
                outs.append((0, {k: out[k]
                                 for k in ("loss", "score", "batch_size")}))
            for _, loss, score, bsz in fetch_metric_window(
                    outs, ("loss", "score", "batch_size")):
                tb.step_val(loss, score, int(round(bsz)), task)
            score = tb.show_val(epoch, global_step, task)
            if score > best_score and jax.process_index() == 0:
                best_score = score
                save_train_state(os.path.join(output_dir, "best"),
                                 global_step, state, keep=1)
        if jax.process_index() == 0:
            save_train_state(ckpt_dir, global_step, state)
    tb.close()
    logger.info("done; best val score %.4f", best_score)


if __name__ == "__main__":
    main()
