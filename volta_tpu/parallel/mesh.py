"""Device mesh and sharding layout.

TPU-native replacement for the reference's NCCL data parallelism
(reference: apex/apex/parallel/distributed.py:129-639 and
train_task.py:124's init_process_group): a single jitted train step over a
``jax.sharding.Mesh``; gradient reduction compiles to an XLA psum on ICI.

Axes:
  * ``data``  — batch sharding (replaces DDP); spans all chips by default.
  * ``model`` — optional tensor sharding of the FFN/attention projections
    for models too wide for one chip (the reference has no TP; we expose it
    as an optional richer form).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_size(batch_size: int,
                       devices: Optional[Sequence] = None) -> int:
    """Largest device count that divides the per-host batch."""
    n = len(devices if devices is not None else jax.devices())
    d = min(n, max(batch_size, 1))
    while batch_size % d:
        d -= 1
    return d


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_OUT_SHARDED = ("inter_dense", "v_inter_dense", "query", "key", "value",
                "v_query", "v_key", "v_value")
_IN_SHARDED = ("out_dense", "v_out_dense")


def _param_pspec(path, leaf, n_model: int) -> P:
    """Parameter layout. With ``model`` axis >1, Megatron-style sharding:

    * FFN up-projections and QKV over the output dim (heads), the paired
      down/output projections over the input dim (psum on exit);
    * the word-embedding table over the vocab dim — this is also the tied
      MLM decoder, the largest matmul in pretraining (vocab-parallel
      logits + sharded decoder bias);
    * the per-objective image prediction heads over their target dim.
    """
    if n_model <= 1:
        return P()

    def fits(spec: P) -> P:
        # device_put rejects uneven shards; replicate odd dims (e.g. the
        # 1601-way kl head)
        for dim, name in enumerate(spec):
            if name == "model" and leaf.shape[dim] % n_model:
                return P()
        return spec

    names = [p.key for p in path if hasattr(p, "key")]
    leafname = names[-1] if names else ""
    mod = names[-2] if len(names) >= 2 else ""
    if leafname == "embedding" and mod == "word_embeddings" \
            and leaf.ndim == 2:
        return fits(P("model", None))
    if leafname == "decoder_bias":
        return fits(P("model"))
    if mod.startswith("decoder_") and "image_predictions" in names:
        return fits(P(None, "model") if leafname == "kernel"
                    else P("model"))
    if leafname == "kernel" and leaf.ndim == 2:
        if mod in _OUT_SHARDED:
            return fits(P(None, "model"))
        if mod in _IN_SHARDED:
            return fits(P("model", None))
    if leafname == "bias" and mod in _OUT_SHARDED:
        return fits(P("model"))
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for the parameters (replicated on data,
    optionally tensor-sharded on model)."""
    n_model = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _param_pspec(path, leaf, n_model)), params)


def state_shardings(mesh: Mesh, state):
    """NamedSharding pytree for a whole TrainState: parameter-shaped leaves
    (params and optimizer moments — identified by their trailing path names)
    get the tensor-parallel layout, everything else is replicated."""
    n_model = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _param_pspec(path, leaf, n_model)
            if hasattr(leaf, "ndim") else P()), state)


# batch keys consumed only on the host (eval dumps zip predictions with the
# HOST batch's ids, eval_task.py:collect_results) — never shipped to the
# device, where they would spend host->device link bytes every step
HOST_ONLY_KEYS = frozenset({"question_id"})


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along the data axis.

    Single-process: ``device_put`` of the full batch. Multi-process (real
    multi-host or the 2-process CPU simulation in
    tests/test_multihost_sim.py): each host's loader yields only its local
    shard (task_utils.py per-host ``num_shards``), so the global array is
    assembled from the process-local data — a plain ``device_put`` there
    would silently treat each host's local batch as the global one.
    """
    sh = batch_sharding(mesh)
    if isinstance(batch, dict) and HOST_ONLY_KEYS.intersection(batch):
        batch = {k: v for k, v in batch.items() if k not in HOST_ONLY_KEYS}
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
