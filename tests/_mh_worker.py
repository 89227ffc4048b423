"""Worker process for the 2-process multi-host simulation test.

Invoked as: python _mh_worker.py <process_id> <coordinator_port> <out_json>
Forms a 2-process CPU jax.distributed cluster (1 device per process),
builds the tiny VQA model with a fixed seed (identical params on both
hosts), feeds each host a DIFFERENT local batch through the real
shard_batch path, runs one jitted DP train step, and writes the stepped
loss + a param fingerprint.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def local_batch(pid, cfg, b, l, r):
    import numpy as np

    rng = np.random.RandomState(100 + pid)
    return {
        "question": rng.randint(0, cfg.vocab_size, (b, l)).astype(np.int32),
        "features": rng.randn(b, r, cfg.v_feature_size).astype(np.float32),
        "spatials": rng.rand(b, r, cfg.num_locs).astype(np.float32),
        "segment_ids": np.zeros((b, l), np.int32),
        "input_mask": np.ones((b, l), np.int32),
        "image_mask": np.ones((b, r), np.int32),
        "target": rng.rand(b, 9).astype(np.float32),
        "question_id": np.arange(b, dtype=np.int64) + 1000 * pid,
    }


def main():
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    import jax

    jax.config.update("jax_default_prng_impl", "threefry2x32")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np

    from volta_tpu import zoo
    from volta_tpu.models import VoltaForVLTasks
    from volta_tpu.optimization import build_optimizer, \
        warmup_linear_schedule
    from volta_tpu.parallel import (create_train_state, make_mesh,
                                    make_task_train_step, shard_batch)

    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg.compute_dtype = "float32"
    cfg.use_pallas = False
    task_cfg = {"TASK1": {"type": "VL-classifier", "num_labels": 9,
                          "loss": "BCEWithLogitLoss"}}
    b, l, r = 4, 10, 7  # per-host batch; global = 8
    batch = local_batch(pid, cfg, b, l, r)

    model = VoltaForVLTasks(cfg, task_cfg, ("TASK1",))
    params = model.init(jax.random.PRNGKey(0), batch["question"],
                        batch["features"], batch["spatials"], "TASK1",
                        batch["segment_ids"], batch["input_mask"],
                        batch["image_mask"])["params"]
    tx = build_optimizer("adamw", warmup_linear_schedule(1e-3, 10, 100),
                         params, clip_norm=1.0)
    state = create_train_state(jax.random.PRNGKey(1), params, tx)
    mesh = make_mesh(n_data=jax.device_count(), n_model=1)
    step = make_task_train_step(model, tx, task_cfg, "TASK1", mesh=mesh)

    losses = []
    for _ in range(2):
        state, m = step(state, shard_batch(mesh, batch))
        losses.append(float(m["loss"]))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    fp = float(np.asarray(jax.device_get(leaf)).ravel()[:8].sum())
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "losses": losses, "fingerprint": fp,
                   "process_count": jax.process_count(),
                   "device_count": jax.device_count()}, f)


if __name__ == "__main__":
    main()
