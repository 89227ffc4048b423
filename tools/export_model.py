#!/usr/bin/env python
"""Export a fine-tuned task model to a serving artifact (StableHLO).

Builds the model from a config + checkpoint and writes a serialized
``jax.export`` artifact a serving process can load with
``volta_tpu.export.load_exported`` (or plain ``jax.export.deserialize``)
— no model code needed at serving time. Default artifact is
parameterized (call as ``(variables, *batch)``; weights ship separately);
``--bake_weights`` embeds them for a single-file deployment.

Usage:
  python tools/export_model.py --config_file configs/ctrl_uniter_base.json \
      --tasks_config_file config_tasks/ctrl_test_tasks.yml --task 1 \
      --from_pretrained <ckpt> --out vqa_serving.stablehlo \
      --batch_size 32 [--platforms cpu tpu] [--check]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--tasks_config_file", required=True)
    p.add_argument("--task", required=True)
    p.add_argument("--from_pretrained", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", default="32",
                   help="int, or a symbolic dim like 'b' for a "
                        "batch-polymorphic artifact")
    p.add_argument("--seq_len", type=int, default=0,
                   help="default: the task's max_seq_length")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="target platforms (default: current backend); "
                        "non-tpu targets force the XLA (no-pallas) path")
    p.add_argument("--bake_weights", action="store_true",
                   help="embed the weights as constants (self-contained "
                        "single-file artifact, hundreds of MB); default "
                        "is a parameterized artifact called as "
                        "(variables, *batch)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--use_pallas", action="store_true",
                   help="keep the Mosaic kernels in the artifact "
                        "(tpu-only serving)")
    p.add_argument("--quantize", default=None,
                   choices=["int8", "int8_static"],
                   help="weight+activation int8 dense matmuls (serving "
                        "only; weights ship 4x smaller; see "
                        "volta_tpu/ops/int8_dense.py). int8_static "
                        "calibrates static activation scales on random "
                        "batches (fused requant — the fast path). With "
                        "--check, also prints logit deviation + top-1 "
                        "agreement vs the unquantized forward on a "
                        "random batch")
    p.add_argument("--calibrate_batches", type=int, default=2,
                   help="int8_static: number of random calibration "
                        "batches (seeds disjoint from the --check batch)")
    p.add_argument("--calib_npz", default="",
                   help="int8_static: npz of REAL eval batches for "
                        "calibration and the --check comparison (keys "
                        "input_ids/image_feat/image_loc/token_type_ids/"
                        "attention_mask/image_attention_mask, each with a "
                        "leading batch-of-batches axis; dump them from an "
                        "eval loader). Without it, calibration uses "
                        "synthetic random batches — adequate for "
                        "benchmarking, but real-data activation outliers "
                        "beyond the synthetic range would clip silently, "
                        "so use real batches for production artifacts")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and run a zero batch")
    p.add_argument("--bench", type=int, default=0,
                   help="with --check: time N serving calls and print "
                        "samples/sec")
    args = p.parse_args()

    import jax

    from volta_tpu import export as vexport
    from volta_tpu.checkpoint import from_pretrained
    from volta_tpu.config import VoltaConfig
    from volta_tpu.models import VoltaForVLTasks
    from volta_tpu.task_utils import load_task_config, task_key

    cfg = VoltaConfig.from_json_file(args.config_file)
    cfg.compute_dtype = args.compute_dtype
    cfg.use_pallas = bool(args.use_pallas)
    if args.use_pallas and not args.platforms:
        # Mosaic custom calls pin the artifact to TPU; exporting for the
        # "current backend" (the axon platform here) would be rejected by
        # export_task_forward's portability check. An explicit empty
        # --platforms list gets the same default.
        args.platforms = ["tpu"]
    task_cfg = load_task_config(args.tasks_config_file)
    task = task_key(args.task)
    tc = task_cfg[task]
    if tc.get("fusion_method"):
        cfg.fusion_method = tc["fusion_method"]
    seq_len = args.seq_len or int(tc["max_seq_length"])
    region_len = int(tc["max_region_num"]) + \
        (1 if cfg.add_global_imgfeat else 0)

    model = VoltaForVLTasks(cfg, task_cfg, (task,))
    bs = args.batch_size if not args.batch_size.isdigit() \
        else int(args.batch_size)
    init_bs = bs if isinstance(bs, int) else 2
    shapes = vexport._eval_arg_shapes(cfg, init_bs, seq_len,
                                      region_len)
    zeros = [np.zeros(s.shape, s.dtype) for s in shapes]
    variables = jax.jit(lambda r: model.init(
        r, zeros[0], zeros[1], zeros[2], task, zeros[3], zeros[4],
        zeros[5]))(jax.random.PRNGKey(0))
    if args.from_pretrained:
        variables, report = from_pretrained(cfg, variables,
                                            args.from_pretrained)
        print(f"loaded {len(report['loaded'])} tensors")

    def rand_batch(seed):
        rng = np.random.RandomState(seed)
        b = [z.copy() for z in zeros]
        b[0] = rng.randint(1, cfg.vocab_size, b[0].shape).astype(np.int32)
        b[1] = (rng.randn(*b[1].shape) * 0.5).astype(np.float32)
        b[2] = rng.rand(*b[2].shape).astype(np.float32)
        b[4] = np.ones_like(b[4])
        b[5] = np.ones_like(b[5])
        return b

    calib_batches = None
    if args.calib_npz:
        z = np.load(args.calib_npz)
        keys = ("input_ids", "image_feat", "image_loc", "token_type_ids",
                "attention_mask", "image_attention_mask")
        missing = [k for k in keys if k not in z]
        if missing:
            raise SystemExit(f"--calib_npz missing arrays: {missing}")
        arrs = [z[k] for k in keys]
        calib_batches = [[a[i] for a in arrs] for i in range(arrs[0].shape[0])]
        print(f"calibrating on {len(calib_batches)} real batches "
              f"from {args.calib_npz}")

    act_scales = None
    if args.quantize == "int8_static":
        from volta_tpu.ops.int8_dense import calibrate_activation_scales
        apply_fn = lambda v, *b: model.apply(
            v, b[0], b[1], b[2], task, b[3], b[4], b[5])
        if calib_batches is not None:
            # hold the last npz batch OUT of calibration — it is the
            # --check comparison batch, and a check on a calibrated batch
            # can never observe out-of-range clipping
            cal = calib_batches[:-1] if len(calib_batches) > 1 \
                else calib_batches
        else:
            cal = [rand_batch(s + 1) for s in range(args.calibrate_batches)]
        act_scales = calibrate_activation_scales(apply_fn, variables, cal)
        print(f"calibrated {len(act_scales)} activation scales "
              f"on {len(cal)} batches")

    exported = vexport.export_task_forward(
        cfg, task_cfg, task, variables, bs, seq_len,
        region_len, platforms=args.platforms,
        bake_weights=args.bake_weights, quantize=args.quantize,
        act_scales=act_scales)
    vexport.save_exported(exported, args.out)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 2**20:.1f} MiB, "
          f"platforms={exported.platforms})")

    call_vars = variables
    if args.quantize:
        from volta_tpu.ops.int8_dense import quantize_variables
        rd = vexport.quantize_residual_dtype(cfg)
        call_vars = jax.jit(
            lambda v: quantize_variables(v, residual_dtype=rd,
                                         act_scales=act_scales))(variables)

    if args.check:
        back = vexport.load_exported(args.out)
        call = back.call if args.bake_weights else \
            (lambda *b: back.call(call_vars, *b))
        out = np.asarray(call(*zeros))
        print(f"check OK: output {out.shape} {out.dtype}, "
              f"|mean|={abs(float(out.astype(np.float32).mean())):.4f}")
        if args.quantize:
            # prefer a real held-out batch (the last calib_npz batch);
            # else seed 0, disjoint from the calibration seeds (1..N)
            rand = calib_batches[-1] if calib_batches is not None \
                else rand_batch(0)
            qlog = np.asarray(call(*rand), np.float32)
            flog = np.asarray(jax.jit(
                lambda v, *b: model.apply(
                    v, b[0], b[1], b[2], task, b[3], b[4], b[5])[0]
            )(variables, *rand), np.float32)
            dev = np.abs(qlog - flog)
            agree = float((qlog.argmax(-1) == flog.argmax(-1)).mean())
            print(f"int8 vs {args.compute_dtype}: max|dlogit|={dev.max():.4f} "
                  f"mean={dev.mean():.5f} top1-agreement={agree:.3f}")
        if args.bench:
            import time

            dev_zeros = jax.device_put(tuple(zeros))
            if args.bake_weights:
                raw = jax.jit(back.call)
                fn = lambda: raw(*dev_zeros)
            else:
                dev_vars = jax.device_put(call_vars)
                raw = jax.jit(back.call)
                fn = lambda: raw(dev_vars, *dev_zeros)
            float(np.asarray(fn()).ravel()[0])  # compile
            t0 = time.perf_counter()
            for _ in range(args.bench):
                o = fn()
            float(np.asarray(o).ravel()[0])
            dt = (time.perf_counter() - t0) / args.bench
            print(f"serving bench: {dt * 1000:.2f} ms/call, "
                  f"{zeros[0].shape[0] / dt:.0f} samples/sec")


if __name__ == "__main__":
    main()
