"""Trace-time mesh context: gives Pallas kernels a partitioning story.

XLA's GSPMD partitioner cannot split an opaque ``pallas_call`` the way it
splits einsums, so on a multi-device mesh the fused-attention kernels must
be wrapped in ``jax.shard_map``: each device runs the kernel on its local
[B/data, L, H/model, D] block (attention is embarrassingly parallel over
batch and heads). The step builders in train_step.py install the mesh here
at trace time; the attention call sites consult it.

This replaces nothing in the reference (it has no TP; apex DDP is data-only)
— it is the TPU-native richer form promised in SURVEY.md §2.3.
"""

from __future__ import annotations

import contextlib
import threading

_STATE = threading.local()


@contextlib.contextmanager
def mesh_context(mesh):
    """Install ``mesh`` for the duration of a traced step body. A mesh with
    a single device is treated as no mesh (plain single-chip lowering)."""
    prev = getattr(_STATE, "mesh", None)
    _STATE.mesh = mesh if mesh is not None and mesh.size > 1 else None
    try:
        yield
    finally:
        _STATE.mesh = prev


def current_mesh():
    return getattr(_STATE, "mesh", None)


def _attention_specs(mesh):
    from jax.sharding import PartitionSpec as P

    data = "data" if mesh.shape.get("data", 1) > 1 else None
    model = "model" if mesh.shape.get("model", 1) > 1 else None
    qkv = P(data, None, model, None)          # [B, L, H, D]
    bias = P(data, None, None, None)          # [B, 1, 1, Lk]
    return qkv, bias


def shardable(mesh, q) -> bool:
    """Local blocks must tile evenly: batch over ``data``, heads over
    ``model``."""
    b, _, h, _ = q.shape
    return (b % mesh.shape.get("data", 1) == 0
            and h % mesh.shape.get("model", 1) == 0)


def shard_attention(fn, q, k, v, bias):
    """Run ``fn(q, k, v, bias)`` per-device over the active mesh (or
    directly when no mesh is active). ``fn`` must be batch/head-parallel."""
    import jax

    mesh = current_mesh()
    if mesh is None:
        return fn(q, k, v, bias)
    qkv, bspec = _attention_specs(mesh)
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # metadata, so shard_map's vma verification cannot apply to the kernels
    return jax.shard_map(fn, mesh=mesh, in_specs=(qkv, qkv, qkv, bspec),
                         out_specs=qkv, check_vma=False)(q, k, v, bias)


def shard_dropout_attention(fn, q, k, v, bias, seed):
    """Same, for the in-kernel-dropout path: the int32 seed is offset by the
    device's mesh coordinates so replicas draw independent masks (the kernel
    itself only mixes in *local* program ids)."""
    import jax
    from jax.sharding import PartitionSpec as P

    mesh = current_mesh()
    if mesh is None:
        return fn(q, k, v, bias, seed)
    qkv, bspec = _attention_specs(mesh)

    def local(q, k, v, bias, seed):
        off = 0
        for axis, stride in (("data", 100003), ("model", 393241)):
            if mesh.shape.get(axis, 1) > 1:
                off = off + jax.lax.axis_index(axis) * stride
        return fn(q, k, v, bias, seed + off)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(qkv, qkv, qkv, bspec, P()),
        out_specs=qkv, check_vma=False)(q, k, v, bias, jnp_int32(seed))


def shardable_rows(mesh, x) -> bool:
    """Row-parallel kernels (fused residual-LN) shard batch over ``data``;
    the hidden axis stays whole and the activation is replicated over
    ``model``."""
    from ..ops.fused_residual import supported

    b = x.shape[0]
    data = mesh.shape.get("data", 1)
    if b % data:
        return False
    local = x[: b // data]
    return supported(local)


def shard_residual_ln(fn, o, x, scale, bias, seed):
    """Run ``fn(o, x, scale, bias, seed)`` per-device over the active mesh.
    Rows split over ``data``; scale/bias replicated. The seed is offset by
    the data coordinate only — model-axis replicas must draw the *same*
    mask so the replicated activations stay consistent."""
    import jax
    from jax.sharding import PartitionSpec as P

    mesh = current_mesh()
    if mesh is None:
        return fn(o, x, scale, bias, seed)
    data = "data" if mesh.shape.get("data", 1) > 1 else None
    rows = P(*((data,) + (None,) * (o.ndim - 1)))

    def local(o, x, scale, bias, seed):
        if data is not None:
            seed = seed + jax.lax.axis_index("data") * 100003
        return fn(o, x, scale, bias, seed)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(rows, rows, P(), P(), P()),
        out_specs=rows, check_vma=False)(o, x, scale, bias, jnp_int32(seed))


def jnp_int32(x):
    import jax.numpy as jnp

    return jnp.asarray(x, jnp.int32)
