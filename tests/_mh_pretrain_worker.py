"""Worker process for the 2-process CC pretraining simulation.

Invoked as: python _mh_pretrain_worker.py <pid> <port> <out_json> <data_dir>
Forms a 2-process CPU cluster; each worker consumes its OWN per-rank LMDB
shard (``training_feat_part_<pid>.lmdb``, the reference's multi-rank CC
layout, concept_cap_dataset.py:194-198) through the real loader, and runs
4 micro-steps of the jitted DP pretraining step under grad-accum 2
(optax.MultiSteps -> 2 optimizer updates). Writes losses + fingerprint.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SEQ, REG, BATCH = 14, 5, 4
MICRO_STEPS = 4  # 2 updates x grad_accum 2


def tiny_cfg():
    from volta_tpu import zoo

    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg.compute_dtype = "float32"
    cfg.use_pallas = False
    return cfg


def make_loader(data_dir, shard_index, num_shards=2):
    from volta_tpu.data.datasets.concap import make_concap_loader
    from volta_tpu.data.tokenization import BertTokenizer

    tok = BertTokenizer(os.path.join(data_dir, "vocab.txt"))
    cfg = tiny_cfg()
    return make_concap_loader(
        os.path.join(data_dir, "imgfeats"),
        os.path.join(data_dir, "annotations"), tok, split="train",
        seq_len=SEQ, region_len=REG, batch_size=BATCH, num_workers=0,
        objective=0, num_locs=cfg.num_locs,
        add_global_imgfeat=cfg.add_global_imgfeat, seed=0,
        num_shards=num_shards, shard_index=shard_index)


def build_step(params_batch, mesh):
    import jax

    from volta_tpu.models import VoltaForVLPreTraining
    from volta_tpu.optimization import build_optimizer, \
        warmup_linear_schedule
    from volta_tpu.parallel import create_train_state, make_pretrain_step

    cfg = tiny_cfg()
    model = VoltaForVLPreTraining(cfg)
    params = model.init(
        jax.random.PRNGKey(0), params_batch["input_ids"],
        params_batch["image_feat"], params_batch["image_loc"],
        params_batch["segment_ids"], params_batch["input_mask"],
        params_batch["image_mask"])["params"]
    tx = build_optimizer("adamw", warmup_linear_schedule(1e-3, 10, 100),
                         params, clip_norm=1.0, grad_accum_steps=2)
    state = create_train_state(jax.random.PRNGKey(1), params, tx)
    step = make_pretrain_step(model, tx, cfg, objective=0, mesh=mesh)
    return state, step


def main():
    pid, port, out_path, data_dir = (int(sys.argv[1]), sys.argv[2],
                                     sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_default_prng_impl", "threefry2x32")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np

    from volta_tpu.parallel import make_mesh, shard_batch

    ds, loader = make_loader(data_dir, shard_index=pid)
    mesh = make_mesh(n_data=jax.device_count(), n_model=1)

    it = iter(loader)
    first = next(it)
    state, step = build_step(first, mesh)

    losses = []
    batch = first
    for i in range(MICRO_STEPS):
        state, m = step(state, shard_batch(mesh, batch))
        losses.append(float(m["loss"]))
        if i + 1 < MICRO_STEPS:
            batch = next(it)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    fp = float(np.asarray(jax.device_get(leaf)).ravel()[:8].sum())
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "losses": losses, "fingerprint": fp,
                   "n_local": len(ds),
                   "process_count": jax.process_count(),
                   "device_count": jax.device_count()}, f)


if __name__ == "__main__":
    main()
