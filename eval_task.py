#!/usr/bin/env python
"""Evaluate a fine-tuned model on a task split and dump predictions.

reference: eval_task.py. Writes ``<split>_result.json`` with the per-task
prediction records (reference: volta/task_utils.py:540-616).
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
    p.add_argument("--task", default="1", type=str)
    p.add_argument("--split", default="", type=str)
    p.add_argument("--do_lower_case", action="store_true", default=True)
    p.add_argument("--vocab_file", default="", type=str)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--drop_last", action="store_true")
    p.add_argument("--in_memory", default=False, type=bool)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    # accepted for reference-script drop-in compat; no-ops here
    # (reference: eval_task.py:80 use_chunk is a GPU-memory chunking hack,
    # local_rank is a torch.distributed.launch artifact)
    p.add_argument("--use_chunk", default=0, type=float)
    p.add_argument("--local_rank", type=int, default=-1)
    p.add_argument("--dump_attn", type=int, default=0, metavar="N",
                   help="save per-sublayer attention maps ({intra_attn, "
                        "inter_attn, queries, keys} per stream — the "
                        "reference's visualization/output_all_attention_"
                        "masks data, volta/encoders.py:342-358) for the "
                        "first N eval batches as attn_<split>_<i>.npz")
    return p.parse_args()


def dump_attn_maps(attn, qids, path, row_index=None):
    """Flatten the per-sublayer (t_data, v_data) dicts into one .npz with
    keys like ``s03_t_intra_attn`` ([B, H, Lq, Lk] f32) plus the batch's
    question_ids and, via ``row_index``
    (task_utils.process_row_index), per-row provenance arrays —
    ``row_qid_index`` / ``row_option`` / ``row_round`` — so expanded
    processes (expand / retrieval / nlvr / dialog) are self-describing."""
    arrays = {"question_id": np.asarray(qids)}
    n_meta = 1 + len(row_index or {})
    for k, v in (row_index or {}).items():
        arrays[k] = np.asarray(v)
    for li, (t_data, v_data) in enumerate(attn):
        for stream, data in (("t", t_data), ("v", v_data)):
            for key, val in data.items():
                if val is not None:
                    arrays[f"s{li:02d}_{stream}_{key}"] = \
                        np.asarray(val, dtype=np.float32)
    np.savez_compressed(path, **arrays)
    return len(arrays) - n_meta


def collect_results(task_type, prediction, batch, info, dataset, results):
    """Prediction records per task type
    (reference: volta/task_utils.py:540-616)."""
    pred = np.asarray(prediction)
    qids = np.asarray(batch["question_id"])
    if task_type == "VL-classifier":
        for qid, row in zip(qids, pred.argmax(1)):
            results.append({"question_id": int(qid),
                            "answer": dataset.label2ans[int(row)]})
    elif task_type == "VL-classifier-GQA":
        for qid, row in zip(qids, pred.argmax(1)):
            true_qid = dataset.entries[int(qid)]["question_id"]
            results.append({"questionId": str(true_qid),
                            "prediction": dataset.label2ans[int(row)]})
    elif task_type == "VL-logit":
        logit = pred.reshape(info["batch_size"], info["num_options"])
        probs = np.exp(logit - logit.max(1, keepdims=True))
        probs /= probs.sum(1, keepdims=True)
        for qid, row in zip(qids, probs):
            results.append({"question_id": int(qid),
                            "answer": [float(p) for p in row]})
    elif task_type == "V-logit-mc":
        # gather the candidate logits among the 101.. trailing region
        # slots and dump the chosen candidate index
        # (reference: volta/task_utils.py:595-606)
        mc = np.asarray(batch["multi_choice_ids"])
        logit = np.take_along_axis(pred[:, 101:, 0], mc, 1)
        for qid, s in zip(qids, logit.argmax(1)):
            results.append({"id": int(qid), "target": int(s)})
    elif task_type.startswith("V-logit"):
        sel = pred[..., 0].argmax(1)
        tgt = np.asarray(batch["target"])[..., 0]
        picked = np.take_along_axis(tgt, sel[:, None], 1)[:, 0]
        for qid, s, iou in zip(qids, sel, picked):
            results.append({"id": int(qid), "target": int(s),
                            "IOU": float(iou)})
    else:  # binary / tri classifiers
        for qid, row in zip(qids, pred.argmax(1)):
            results.append({"question_id": int(qid), "answer": int(row)})
    return results


def main():
    args = parse_args()

    import jax

    from volta_tpu.checkpoint import from_pretrained
    from volta_tpu.config import VoltaConfig
    from volta_tpu.models import VoltaForVLTasks
    from volta_tpu.parallel import make_task_eval_step
    from volta_tpu.task_utils import (load_dataset_eval, load_task_config,
                                      process_batch, task_key)

    from volta_tpu.train_utils import set_seed

    set_seed(args.seed)
    cfg = VoltaConfig.from_json_file(args.config_file)
    cfg.compute_dtype = args.compute_dtype
    if args.no_pallas:
        cfg.use_pallas = False
    task_cfg = load_task_config(args.tasks_config_file)
    task = task_key(args.task)
    tc = task_cfg[task]
    if tc.get("fusion_method"):
        # per-task pooling override (reference: eval_task.py:116-118)
        cfg.fusion_method = tc["fusion_method"]

    data = load_dataset_eval(args, cfg, task_cfg, args.task)
    ds, loader = data["dataset"], data["loader"]
    if "num_labels" not in tc and hasattr(ds, "num_labels"):
        tc["num_labels"] = ds.num_labels

    model = VoltaForVLTasks(cfg, task_cfg, (task,))
    sample = next(iter(loader))
    inputs, _ = process_batch(tc, sample)
    variables = jax.jit(lambda r: model.init(
        r, np.asarray(inputs["input_ids"]), np.asarray(inputs["image_feat"]),
        np.asarray(inputs["image_loc"]), task,
        np.asarray(inputs["token_type_ids"]),
        np.asarray(inputs["attention_mask"]),
        np.asarray(inputs["image_attention_mask"])))(jax.random.PRNGKey(0))
    if args.from_pretrained:
        variables, report = from_pretrained(cfg, variables,
                                            args.from_pretrained)
        logger.info("loaded %d tensors", len(report["loaded"]))

    eval_step = make_task_eval_step(model, task_cfg, task)

    attn_step = None
    if args.dump_attn:
        from volta_tpu.task_utils import process_batch as _pb

        def attn_fn(params, batch):
            ins, _ = _pb(tc, batch)
            _, extras = model.apply(
                {"params": params}, ins["input_ids"], ins["image_feat"],
                ins["image_loc"], task, ins["token_type_ids"],
                ins["attention_mask"], ins["image_attention_mask"],
                deterministic=True, output_probs=True)
            return extras["probs"]

        attn_step = jax.jit(attn_fn)
        os.makedirs(args.output_dir, exist_ok=True)

    from volta_tpu.train_utils import fetch_metric_window

    results = []
    metric_refs = []
    for bi, batch in enumerate(loader):
        if attn_step is not None and bi < args.dump_attn:
            split_name = args.split or tc["val_split"]
            path = os.path.join(args.output_dir,
                                f"attn_{split_name}_{bi}.npz")
            # question_id stays on host (string ids for GQA-style
            # datasets are not jittable; see parallel/mesh.HOST_ONLY_KEYS)
            jb = {k: v for k, v in batch.items() if k != "question_id"}
            from volta_tpu.task_utils import process_row_index
            n = dump_attn_maps(attn_step(variables["params"], jb),
                               batch["question_id"], path,
                               row_index=process_row_index(tc, batch))
            logger.info("wrote %d attention arrays to %s", n, path)
        out = eval_step(variables["params"], batch)
        # predictions must come to host per batch (they are the output);
        # the loss/score scalars are kept as device refs and fetched in
        # one fused transfer at the end (a float() each would cost a full
        # round trip per batch). Keep ONLY the scalars — retaining the
        # whole dict would pin every batch's prediction buffer in HBM
        metric_refs.append((0, {k: out[k]
                                for k in ("loss", "score", "batch_size")}))
        from volta_tpu.task_utils import process_batch as pb
        _, info = pb(tc, batch)
        collect_results(tc["type"], out["prediction"], batch, info, ds,
                        results)
    total_loss = total_score = total_n = 0
    for _, loss, score, bsz in fetch_metric_window(
            metric_refs, ("loss", "score", "batch_size")):
        total_loss += loss
        total_score += score
        total_n += int(round(bsz))
    if total_n:
        logger.info("eval loss %.4f score %.4f", total_loss / max(total_n, 1),
                    total_score / total_n)

    save_path = os.path.join(
        args.output_dir,
        f"{tc['name']}_{os.path.basename(args.config_file)}-"
        f"{args.save_name or 'base'}")
    os.makedirs(save_path, exist_ok=True)
    split = args.split or tc["val_split"]
    out_file = os.path.join(save_path, split + "_result.json")
    json.dump(results, open(out_file, "w"))
    logger.info("wrote %d predictions to %s", len(results), out_file)


if __name__ == "__main__":
    main()
