#!/usr/bin/env python
"""Export volta_tpu weights to a reference-format torch ``.bin``.

The inverse of the checkpoint importer: a model pretrained or fine-tuned in
volta_tpu becomes a state dict the reference framework (/root/reference-style
``volta``) loads with ``load_state_dict(strict=True)`` — including the tied
MLM decoder weight and the share_layer ``v_*`` alias keys (reference naming:
volta/encoders.py). Weight sources accepted: a ``save_pretrained`` flax
bundle, an Orbax train-state checkpoint dir, or a torch ``.bin`` (pass-through
re-export after name normalisation).

Usage:
  # pretraining wrapper tree (bert.* + cls.*) — the common migration path
  python tools/export_torch_checkpoint.py --config_file configs/ctrl_uniter_base.json \
      --weights <ckpt-or-bundle> --out pytorch_model.bin

  # fine-tuned task tree (bert.* + clfs_dict.*)
  python tools/export_torch_checkpoint.py --config_file ... --weights ... \
      --tasks_config_file config_tasks/ctrl_trainval_tasks.yml --task 1 \
      --out pytorch_model.bin
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--weights", required=True,
                   help="flax bundle dir / orbax ckpt dir / torch .bin")
    p.add_argument("--out", required=True)
    p.add_argument("--tasks_config_file", default="",
                   help="build a BertForVLTasks tree for --task instead of "
                        "the pretraining wrapper")
    p.add_argument("--task", default="")
    p.add_argument("--bert_only", action="store_true",
                   help="export the bare BertModel tree (no heads)")
    p.add_argument("--seq_len", type=int, default=16)
    p.add_argument("--region_len", type=int, default=0,
                   help="default: 36 + global-feature row if configured")
    args = p.parse_args()

    import jax

    from volta_tpu.checkpoint import from_pretrained, save_torch_checkpoint
    from volta_tpu.config import VoltaConfig
    from volta_tpu.models import (VoltaForVLPreTraining, VoltaForVLTasks,
                                  VoltaModel)

    cfg = VoltaConfig.from_json_file(args.config_file)
    cfg.use_pallas = False
    cfg.compute_dtype = "float32"
    b, t = 2, args.seq_len
    r = args.region_len or (36 + (1 if cfg.add_global_imgfeat else 0))
    ids = np.zeros((b, t), np.int32)
    feats = np.zeros((b, r, cfg.v_feature_size), np.float32)
    locs = np.zeros((b, r, cfg.num_locs), np.float32)
    types = np.zeros((b, t), np.int32)
    ones_t = np.ones((b, t), np.int32)
    ones_v = np.ones((b, r), np.int32)

    if args.tasks_config_file:
        from volta_tpu.task_utils import load_task_config, task_key

        task_cfg = load_task_config(args.tasks_config_file)
        task = task_key(args.task)
        tc = task_cfg[task]
        if tc.get("fusion_method"):
            cfg.fusion_method = tc["fusion_method"]
        model = VoltaForVLTasks(cfg, task_cfg, (task,))
        variables = jax.jit(lambda k: model.init(
            k, ids, feats, locs, task, types, ones_t, ones_v))(
                jax.random.PRNGKey(0))
    elif args.bert_only:
        model = VoltaModel(cfg)
        variables = jax.jit(lambda k: model.init(
            k, ids, feats, locs, types, ones_t, ones_v))(
                jax.random.PRNGKey(0))
    else:
        model = VoltaForVLPreTraining(cfg)
        variables = jax.jit(lambda k: model.init(
            k, ids, feats, locs, types, ones_t, ones_v))(
                jax.random.PRNGKey(0))

    variables, report = from_pretrained(cfg, variables, args.weights)
    print(f"loaded: {report['loaded'][:3]}... "
          f"({len(report['loaded'])} entries)" if report["loaded"]
          else "loaded nothing", flush=True)
    if report["skipped"]:
        print(f"WARNING: {len(report['skipped'])} params kept their "
              f"fresh init: {report['skipped'][:5]}...")

    save_torch_checkpoint(args.out, cfg, variables)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 2**20:.1f} MiB)")


if __name__ == "__main__":
    main()
