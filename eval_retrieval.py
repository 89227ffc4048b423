#!/usr/bin/env python
"""Image-text retrieval evaluation (COCO / Flickr30k).

reference: eval_retrieval.py. Builds the caption x gallery score matrix by
jitting one (caption broadcast against a gallery chunk) forward — the whole
chunk runs as a single batched forward on the mesh instead of the
reference's per-caption squeeze/repeat loop — then reports image- and
text-retrieval R@1/5/10, median and mean rank. ``--zero_shot`` scores with
the pretraining ITM head (reference: eval_retrieval.py:180-188).
"""

import argparse
import json
import logging
import os

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
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no_pallas", action="store_true")
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

    if args.zero_shot:
        model = VoltaForVLPreTraining(cfg)

        def forward(params, q, f, s, seg, im, vm):
            out = model.apply(params, q, f, s, seg, im, vm)
            return jax.nn.softmax(out["itm_logits"], axis=1)[:, 0]
    else:
        model = VoltaForVLTasks(cfg, task_cfg, (task,))

        def forward(params, q, f, s, seg, im, vm):
            pred, _ = model.apply(params, q, f, s, task, seg, im, vm)
            return pred[:, 0]

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

    fwd = jax.jit(forward)

    score_matrix = np.zeros((n_captions, ds.num_chunks * chunk), np.float32)
    target_matrix = np.zeros_like(score_matrix)
    for idx in range(len(ds)):
        s = ds[idx]
        ci, gi = int(s["caption_idx"]), int(s["image_idx"])
        scores = fwd(variables, bcast(s["question"]), s["features"],
                     s["spatials"], bcast(s["segment_ids"]),
                     bcast(s["input_mask"]), s["image_mask"])
        score_matrix[ci, gi * chunk:(gi + 1) * chunk] = np.asarray(scores)
        target_matrix[ci, gi * chunk:(gi + 1) * chunk] = s["target"]
        if ci % 200 == 0 and gi == ds.num_chunks - 1:
            logger.info("caption %d/%d", ci, n_captions)

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
