#!/usr/bin/env python
"""Image-text retrieval evaluation (COCO / Flickr30k).

reference: eval_retrieval.py. Builds the caption x gallery score matrix by
jitting one (captions x gallery chunk) forward — a whole chunk runs as a
single batched forward instead of the reference's per-caption
squeeze/repeat loop — then reports image- and text-retrieval R@1/5/10,
median and mean rank. ``--zero_shot`` scores with the pretraining ITM head
(reference: eval_retrieval.py:180-188).

TPU-native data movement: the gallery chunks (the dominant bytes — features
[500, r, 2048] per chunk) are uploaded to device HBM ONCE and every forward
ships only the tokenized captions (~KB). The reference re-sends the image
half-batch for every one of the 5000 captions (eval_retrieval.py:172-177 —
~1.5 TB of redundant host->device traffic for the 5000x1000 matrix).
``--captions_per_forward`` additionally scores several captions per
dispatch (the caption block is repeated against the device-resident chunk
inside the jitted program), raising the effective batch to the
throughput-optimal ~1-2k pairs.
"""

import argparse
import json
import logging
import os
import time

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
logger = logging.getLogger(__name__)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--from_pretrained", default="", type=str)
    p.add_argument("--bert_model", default="bert-base-uncased", type=str)
    p.add_argument("--config_file", default="configs/ctrl_uniter_base.json",
                   type=str)
    p.add_argument("--output_dir", default="results", type=str)
    p.add_argument("--save_name", default="", type=str)
    p.add_argument("--tasks_config_file",
                   default="config_tasks/ctrl_test_tasks.yml", type=str)
    p.add_argument("--task", default="8", type=str)
    p.add_argument("--split", default="", type=str)
    p.add_argument("--do_lower_case", action="store_true", default=True)
    p.add_argument("--vocab_file", default="", type=str)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--in_memory", default=False, type=bool)
    p.add_argument("--zero_shot", action="store_true")
    p.add_argument("--captions_per_forward", type=int, default=4,
                   help="captions scored per dispatch against the "
                        "device-resident gallery chunk (effective batch = "
                        "this x gallery_chunk)")
    p.add_argument("--max_captions", type=int, default=0,
                   help="score only the first N captions (throughput "
                        "benchmarking; metrics then cover the subset)")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="run the gallery scoring with int8 dense matmuls "
                        "(weight+activation, int32 accumulation; see "
                        "volta_tpu/ops/int8_dense.py)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    # accepted for reference-script drop-in compat; no-ops here
    # (reference: eval_retrieval.py:68-81 — drop_last/use_chunk tune the
    # torch loader, local_rank is a torch.distributed.launch artifact; our
    # gallery is device-resident and scored in fixed-shape chunks)
    p.add_argument("--drop_last", action="store_true")
    p.add_argument("--use_chunk", default=0, type=float)
    p.add_argument("--local_rank", type=int, default=-1)
    return p.parse_args()


def recall_metrics(rank_matrix):
    n = len(rank_matrix)
    return {
        "r1": 100.0 * float(np.sum(rank_matrix < 1)) / n,
        "r5": 100.0 * float(np.sum(rank_matrix < 5)) / n,
        "r10": 100.0 * float(np.sum(rank_matrix < 10)) / n,
        "medr": float(np.floor(np.median(rank_matrix) + 1)),
        "meanr": float(np.mean(rank_matrix) + 1),
    }


def main():
    args = parse_args()

    import jax

    from volta_tpu.checkpoint import from_pretrained
    from volta_tpu.config import VoltaConfig
    from volta_tpu.models import VoltaForVLPreTraining, VoltaForVLTasks
    from volta_tpu.task_utils import (load_dataset_eval, load_task_config,
                                      task_key)

    from volta_tpu.train_utils import set_seed

    set_seed(args.seed)
    cfg = VoltaConfig.from_json_file(args.config_file)
    cfg.compute_dtype = args.compute_dtype
    if args.no_pallas:
        cfg.use_pallas = False
    task_cfg = load_task_config(args.tasks_config_file)
    task = task_key(args.task)
    tc = task_cfg[task]

    data = load_dataset_eval(args, cfg, task_cfg, args.task)
    ds = data["dataset"]
    chunk = ds.gallery_chunk
    n_images = ds.num_images
    n_captions = len(ds.entries)
    if args.max_captions:
        n_captions = min(n_captions, args.max_captions)

    import jax.numpy as jnp

    cb = max(1, args.captions_per_forward)

    def _expand(q, seg, im, f, s, vm):
        # cb captions x chunk gallery images -> one [cb*chunk] batch; the
        # gallery tensors are device-resident so the tile costs no transfer
        qq = jnp.repeat(q, chunk, axis=0)
        gg = jnp.repeat(seg, chunk, axis=0)
        mm = jnp.repeat(im, chunk, axis=0)
        ff = jnp.tile(f, (cb, 1, 1))
        ss = jnp.tile(s, (cb, 1, 1))
        vv = jnp.tile(vm, (cb, 1))
        return qq, gg, mm, ff, ss, vv

    if args.quantize == "int8":
        from volta_tpu.ops.int8_dense import apply_quantized
        _apply = lambda m, p, *a: apply_quantized(m, p, *a)
    else:
        _apply = lambda m, p, *a: m.apply(p, *a)

    if args.zero_shot:
        model = VoltaForVLPreTraining(cfg)

        def forward(params, q, seg, im, f, s, vm):
            qq, gg, mm, ff, ss, vv = _expand(q, seg, im, f, s, vm)
            out = _apply(model, params, qq, ff, ss, gg, mm, vv)
            return jax.nn.softmax(out["itm_logits"],
                                  axis=1)[:, 0].reshape(cb, chunk)
    else:
        model = VoltaForVLTasks(cfg, task_cfg, (task,))

        def forward(params, q, seg, im, f, s, vm):
            qq, gg, mm, ff, ss, vv = _expand(q, seg, im, f, s, vm)
            pred, _ = _apply(model, params, qq, ff, ss, task, gg, mm, vv)
            return pred[:, 0].reshape(cb, chunk)

    sample = ds[0]
    bcast = lambda x: np.broadcast_to(x[None], (chunk,) + x.shape).copy()
    init_args = (bcast(sample["question"]), sample["features"],
                 sample["spatials"], bcast(sample["segment_ids"]),
                 bcast(sample["input_mask"]), sample["image_mask"])
    if args.zero_shot:
        variables = jax.jit(lambda r: model.init(
            r, init_args[0], init_args[1], init_args[2], init_args[3],
            init_args[4], init_args[5]))(jax.random.PRNGKey(0))
    else:
        variables = jax.jit(lambda r: model.init(
            r, init_args[0], init_args[1], init_args[2], task, init_args[3],
            init_args[4], init_args[5]))(jax.random.PRNGKey(0))

    if args.from_pretrained:
        variables, report = from_pretrained(cfg, variables,
                                            args.from_pretrained)
        logger.info("loaded %d tensors", len(report["loaded"]))

    if args.quantize == "int8":
        from volta_tpu.export import quantize_residual_dtype
        from volta_tpu.ops.int8_dense import quantize_variables
        rd = quantize_residual_dtype(cfg)
        variables = jax.jit(
            lambda v: quantize_variables(v, residual_dtype=rd))(variables)

    fwd = jax.jit(forward)

    # gallery chunks to HBM once; per-dispatch transfers are captions only
    gallery_dev = [jax.device_put(ds.gallery(gi))
                   for gi in range(ds.num_chunks)]

    score_matrix = np.zeros((n_captions, ds.num_chunks * chunk), np.float32)
    target_matrix = np.zeros_like(score_matrix)
    # warm the compile cache so the throughput log reflects steady state
    _c0 = [ds.caption(0)] * cb
    _ = np.asarray(fwd(variables, np.stack([c[0] for c in _c0]),
                       np.stack([c[2] for c in _c0]),
                       np.stack([c[1] for c in _c0]), *gallery_dev[0]))
    t_score = time.perf_counter()
    for c0 in range(0, n_captions, cb):
        # tail block padded by repeating the last caption (rows discarded)
        cis = [min(c0 + k, n_captions - 1) for k in range(cb)]
        caps = [ds.caption(ci) for ci in cis]
        q = np.stack([c[0] for c in caps])
        im = np.stack([c[1] for c in caps])
        seg = np.stack([c[2] for c in caps])
        for gi in range(ds.num_chunks):
            f, s, vm = gallery_dev[gi]
            scores = np.asarray(fwd(variables, q, seg, im, f, s, vm))
            for k in range(cb):
                if c0 + k < n_captions:
                    score_matrix[c0 + k, gi * chunk:(gi + 1) * chunk] = \
                        scores[k]
            for k in range(cb):
                if c0 + k < n_captions:
                    target_matrix[c0 + k, gi * chunk:(gi + 1) * chunk] = \
                        ds.target_row(c0 + k, gi)
        if (c0 // cb) % max(1, 200 // cb) == 0:
            logger.info("caption %d/%d", c0, n_captions)
    dt = time.perf_counter() - t_score
    logger.info("score matrix in %.1fs: %.1f captions/s, %.0f pairs/s",
                dt, n_captions / dt, n_captions * n_images / dt)

    score_matrix = score_matrix[:, :n_images]
    target_matrix = target_matrix[:, :n_images]

    # image retrieval: rank of the true image per caption
    order = np.argsort(-score_matrix, axis=1)
    true_img = target_matrix.argmax(axis=1)
    rank_matrix = np.array(
        [np.where(order[i] == true_img[i])[0][0]
         for i in range(n_captions)], np.float32)
    ir = recall_metrics(rank_matrix)
    print("**** Image Retrieval ****")
    print("Final r1:%.3f, r5:%.3f, r10:%.3f, medr:%.3f, meanr:%.3f" % (
        ir["r1"], ir["r5"], ir["r10"], ir["medr"], ir["meanr"]))

    # text retrieval: best rank among the image's captions
    tr_ranks = np.zeros(n_images, np.float32)
    for j in range(n_images):
        tgt = np.where(target_matrix[:, j] == 1)[0]
        sorted_c = np.argsort(-score_matrix[:, j])
        tr_ranks[j] = min(np.where(sorted_c == t)[0][0] for t in tgt) \
            if len(tgt) else n_captions
    tr = recall_metrics(tr_ranks)
    print("**** Text Retrieval ****")
    print("Final r1:%.3f, r5:%.3f, r10:%.3f, medr:%.3f, meanr:%.3f" % (
        tr["r1"], tr["r5"], tr["r10"], tr["medr"], tr["meanr"]))

    save_path = os.path.join(
        args.output_dir,
        f"{tc['name']}_{os.path.basename(args.config_file)}-"
        f"{args.save_name or 'base'}")
    os.makedirs(save_path, exist_ok=True)
    split = args.split or tc["val_split"]
    results = [order[i].tolist()[:20] for i in range(n_captions)]
    json.dump(results, open(os.path.join(save_path,
                                         split + "_result.json"), "w"))
    json.dump({"image_retrieval": ir, "text_retrieval": tr},
              open(os.path.join(save_path, split + "_metrics.json"), "w"))


if __name__ == "__main__":
    main()
