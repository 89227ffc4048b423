#!/usr/bin/env python
"""Analytic matmul-FLOP estimate per train step for any VoltaConfig.

Counts the dominant dense/attention matmuls of the gated encoder exactly
as built (volta_tpu/models/encoder.py): per-stream Q/K/V/out projections,
joint attention over the concatenated KV, gated feed-forwards with the
per-sublayer width overrides, the vision feature projection, poolers and
a 2-layer task classifier. Backward counted as 2x forward (both matmul
operands need a grad matmul); train = 3x forward.

Purpose: convert measured pairs/s into per-family TFLOP/s and MFU so a
throughput gap between families (e.g. dual-stream vilbert vs single-
stream uniter) can be attributed to roofline (different GFLOP/pair)
vs implementation overhead. reference shapes: train_tasks.yml VQA
(b256 Lt23 r36+global).

Usage:
  python tools/flops_estimate.py --config configs/ctrl_uniter_base.json \
      --pairs_per_s 3674
  python tools/flops_estimate.py --all   # table over the 8 zoo configs
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volta_tpu.config import VoltaConfig

PEAK_TFLOPS = 197.0  # v5e bf16

# round-3e measured device-only rates (BASELINE.md), pairs/s/chip, VQA b256
MEASURED = {
    "ctrl_uniter_base": 3674.0,
    "ctrl_visualbert_base": 3718.0,
    "ctrl_vl-bert_base": 3518.0,
    "ctrl_vilbert_base": 2995.0,
    "ctrl_lxmert": 3096.0,
}


def matmul_flops(m, n, k):
    return 2.0 * m * n * k


def encoder_flops(cfg: VoltaConfig, lt: int, regions: int) -> float:
    """The shared trunk: vision feature projection + every gated
    attention/FFN sublayer as built (volta_tpu/models/encoder.py)."""
    lv = regions + (1 if cfg.add_global_imgfeat else 0)
    h, vh = cfg.hidden_size, cfg.v_hidden_size
    f = matmul_flops(lv, vh, cfg.v_feature_size)
    for spec in cfg.sublayer_plan():
        if spec.kind == "attn":
            ah, vah = spec.attn_hidden_size, spec.v_attn_hidden_size
            if spec.has_text:
                f += 3 * matmul_flops(lt, ah, h)          # q,k,v
                st = (lt if spec.has_tt else 0) + (lv if spec.has_tv else 0)
                f += 2 * matmul_flops(lt, st, ah)         # scores + context
                f += matmul_flops(lt, h, ah)              # out dense
            if spec.has_vision:
                f += 3 * matmul_flops(lv, vah, vh)
                sv = (lt if spec.has_vt else 0) + (lv if spec.has_vv else 0)
                f += 2 * matmul_flops(lv, sv, vah)
                f += matmul_flops(lv, vh, vah)
        else:
            if spec.has_t_ff:
                f += 2 * matmul_flops(lt, spec.intermediate_size, h)
            if spec.has_v_ff:
                f += 2 * matmul_flops(lv, spec.v_intermediate_size, vh)
    return f


def forward_flops(cfg: VoltaConfig, lt: int, regions: int,
                  num_answers: int = 3129) -> float:
    """Fine-tune forward: trunk + poolers (1 row) + 2-layer task
    classifier (SimpleClassifier: pooled -> 2*pooled -> answers)."""
    h, vh = cfg.hidden_size, cfg.v_hidden_size
    f = encoder_flops(cfg, lt, regions)
    pooled = cfg.pooler_size
    f += matmul_flops(1, pooled, h) + matmul_flops(1, cfg.v_pooler_size, vh)
    f += matmul_flops(1, 2 * pooled, pooled)
    f += matmul_flops(1, num_answers, 2 * pooled)
    return f


# losses.PRE_VIS_TARGETS: prediction-head output dims per objective key
PRE_VIS_DIMS = {"0": 1601, "1": 2048, "2": 2048, "3": 1600, "4": 400,
                "5": 2048, "6": 1601}


def pretrain_flops(cfg: VoltaConfig, lt: int, regions: int,
                   batch: int, objectives=None) -> float:
    """Forward FLOPs per pair of the CC pretraining step
    (BertForVLPreTraining heads on top of the trunk): MLM transform +
    30k-vocab tied decoder, per-objective image prediction heads, poolers
    + ITM binary head. NCE ("2") adds the all-pairs [b*r, d] x [d, b*r]
    candidate score matmul (losses.nce_2048) — a per-BATCH cost quadratic
    in b*r, reported per pair. reference shapes:
    /root/reference/train_concap.py:60-68 (b512 seq36 r36+global)."""
    lv = regions + (1 if cfg.add_global_imgfeat else 0)
    h, vh = cfg.hidden_size, cfg.v_hidden_size
    f = encoder_flops(cfg, lt, regions)
    # MLM head: transform dense [lt, h, h] + tied vocab decoder
    f += matmul_flops(lt, h, h)
    f += matmul_flops(lt, cfg.vocab_size, h)
    # image prediction heads (one Linear per enabled target)
    weights = objectives or cfg.visual_target_weights
    for key in weights:
        f += matmul_flops(lv, PRE_VIS_DIMS[str(key)], vh)
        if str(key) == "2":  # NCE all-pairs scores + positive scores
            f += 2.0 * (batch * lv) ** 2 * 2048 / batch
            f += matmul_flops(lv, 1, 2048)
    # poolers + ITM binary head
    f += matmul_flops(1, cfg.pooler_size, h)
    f += matmul_flops(1, cfg.v_pooler_size, vh)
    f += matmul_flops(1, 2, cfg.pooler_size)
    return f


def report(path, lt, regions, pairs_per_s, pretrain=False, batch=512,
           objectives=None):
    cfg = VoltaConfig.from_json_file(path)
    name = os.path.splitext(os.path.basename(path))[0]
    if pretrain:
        fwd = pretrain_flops(cfg, lt, regions, batch,
                             objectives=objectives)
    else:
        fwd = forward_flops(cfg, lt, regions)
    train = 3.0 * fwd
    row = {
        "config": name,
        "fwd_gflop_per_pair": round(fwd / 1e9, 2),
        "train_gflop_per_pair": round(train / 1e9, 2),
    }
    if pretrain:
        row["mode"] = f"pretrain[{','.join(objectives or cfg.visual_target_weights)}]"
    rate = pairs_per_s or (None if pretrain else MEASURED.get(name))
    if rate:
        tf = train * rate / 1e12
        row.update(pairs_per_s=rate, tflops=round(tf, 1),
                   mfu_pct=round(100.0 * tf / PEAK_TFLOPS, 1))
    print(json.dumps(row))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/ctrl_uniter_base.json")
    p.add_argument("--lt", type=int, default=23)
    p.add_argument("--regions", type=int, default=36)
    p.add_argument("--pairs_per_s", type=float, default=None)
    p.add_argument("--all", action="store_true")
    p.add_argument("--pretrain", action="store_true",
                   help="CC pretraining step FLOPs (MLM decoder + MRM "
                        "heads + ITM; use --lt 38 --batch 512)")
    p.add_argument("--batch", type=int, default=512,
                   help="pretrain: global batch (NCE all-pairs term)")
    p.add_argument("--objectives", nargs="*", default=None,
                   help="pretrain: visual objective keys (default: the "
                        "config's visual_target_weights)")
    args = p.parse_args()

    if args.all:
        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs")
        for path in sorted(glob.glob(os.path.join(root, "*.json"))):
            report(path, args.lt, args.regions, None,
                   pretrain=args.pretrain, batch=args.batch,
                   objectives=args.objectives)
    else:
        report(args.config, args.lt, args.regions, args.pairs_per_s,
               pretrain=args.pretrain, batch=args.batch,
               objectives=args.objectives)


if __name__ == "__main__":
    main()
