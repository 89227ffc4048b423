"""Serving export: portable compiled artifacts for the eval forward.

TPU-native serving path the reference has no equivalent of (its deployment
story ends at ``torch.save``): the fine-tuned task forward is staged out
through ``jax.export`` to a serialized StableHLO artifact that a serving
process can load and call without the framework, the model zoo, or the
Python model code (only jax + the target runtime). The artifact pins input
shapes/dtypes and the target platforms, and round-trips through
``serialize``/``deserialize`` bytes. Default is a *parameterized* artifact
(weights passed at call time, ~KB StableHLO); ``bake_weights=True`` embeds
them as constants for a single-file deployment.

Notes:
- With ``cfg.use_pallas`` the program contains Mosaic TPU custom calls,
  which are not portable across platforms; exporting then requires
  ``platforms=("tpu",)`` and opts in to the custom-call safety check.
  For CPU-portable artifacts export with ``cfg.use_pallas = False`` (the
  XLA path is numerically identical; the kernels are a throughput
  optimization).
- Classifier logits come out raw (no softmax), matching
  ``VoltaForVLTasks.__call__``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .config import VoltaConfig


def _eval_arg_shapes(cfg: VoltaConfig, batch_size, seq_len: int,
                     region_len: int):
    """ShapeDtypeStructs of the task-forward inputs, in call order:
    (input_ids, image_feat, image_loc, token_type_ids, attention_mask,
    image_attention_mask). ``batch_size`` may be an int or a symbolic-dim
    string (e.g. ``"b"``) for a batch-polymorphic artifact."""
    f32 = jnp.float32
    i32 = jnp.int32
    b, l, r = batch_size, seq_len, region_len
    if isinstance(b, str):
        (b,) = jax.export.symbolic_shape(b)
    return (
        jax.ShapeDtypeStruct((b, l), i32),
        jax.ShapeDtypeStruct((b, r, cfg.v_feature_size), f32),
        jax.ShapeDtypeStruct((b, r, cfg.num_locs), f32),
        jax.ShapeDtypeStruct((b, l), i32),
        jax.ShapeDtypeStruct((b, l), i32),
        jax.ShapeDtypeStruct((b, r), i32),
    )


def quantize_residual_dtype(cfg: VoltaConfig):
    """Shipping dtype for the non-quantized params of an int8 bundle:
    bf16 when that's the compute dtype (flax casts them there anyway),
    else leave untouched."""
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def export_task_forward(cfg: VoltaConfig, task_cfg, task: str, variables,
                        batch_size, seq_len: int, region_len: int,
                        platforms: Optional[Sequence[str]] = None,
                        bake_weights: bool = False,
                        quantize: Optional[str] = None,
                        act_scales=None):
    """Stage the eval forward for one task out to a ``jax.export.Exported``.

    ``variables`` is the full variable dict ({"params": ...}).
    ``region_len`` must include the global-image row if
    ``cfg.add_global_imgfeat`` is set (i.e. pass the model-facing region
    count). ``batch_size="b"`` exports a batch-polymorphic artifact that
    serves any batch size (sequence and region dims stay pinned — fixed
    shapes are the TPU contract there).

    By default the artifact is *parameterized*: ``.call(variables, *batch)``
    — the StableHLO stays ~KB-sized and weights ship separately (Orbax /
    torch import), so a weight refresh needs no re-export and the compile
    payload stays small. ``bake_weights=True`` embeds the weights as
    constants for a fully self-contained ``.call(*batch)`` artifact
    (hundreds of MB at BERT-base scale).

    ``quantize="int8"`` reroutes every dense matmul through
    weight+activation int8 with int32 accumulation (see
    ``ops/int8_dense.py``); the artifact then takes the bundle from
    ``quantize_variables(variables)`` instead of the raw variables
    (weights ship 4x smaller). Attention kernels, LayerNorms and
    embeddings stay bf16/f32. ``quantize="int8_static"`` additionally
    bakes static activation scales (pass ``act_scales`` from
    ``calibrate_activation_scales``) so the requant is a fused
    elementwise op instead of a per-token reduction.
    """
    from .models import VoltaForVLTasks

    model = VoltaForVLTasks(cfg, task_cfg, (task,))

    if quantize not in (None, "int8", "int8_static"):
        raise ValueError(f"unknown quantize mode: {quantize!r}")
    if quantize is not None:
        from .ops.int8_dense import apply_quantized, quantize_variables
        if quantize == "int8_static" and act_scales is None:
            raise ValueError("int8_static needs act_scales "
                             "(calibrate_activation_scales)")
        variables = quantize_variables(
            variables, residual_dtype=quantize_residual_dtype(cfg),
            act_scales=act_scales if quantize == "int8_static" else None)

        def _apply(variables_, *a):
            return apply_quantized(model, variables_, *a)
    else:
        def _apply(variables_, *a):
            return model.apply(variables_, *a)

    if bake_weights:
        def fwd(input_ids, image_feat, image_loc, token_type_ids,
                attention_mask, image_attention_mask):
            pred, _ = _apply(variables, input_ids, image_feat,
                             image_loc, task, token_type_ids,
                             attention_mask, image_attention_mask)
            return pred
    else:
        def fwd(variables_, input_ids, image_feat, image_loc,
                token_type_ids, attention_mask, image_attention_mask):
            pred, _ = _apply(variables_, input_ids, image_feat,
                             image_loc, task, token_type_ids,
                             attention_mask, image_attention_mask)
            return pred

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    if cfg.use_pallas:
        if platforms is None or set(platforms) - {"tpu"}:
            raise ValueError(
                "use_pallas artifacts contain Mosaic TPU custom calls; "
                "export with platforms=('tpu',) or set cfg.use_pallas=False "
                "for a portable artifact")
        kwargs["disabled_checks"] = [
            jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        ]
    args = _eval_arg_shapes(cfg, batch_size, seq_len, region_len)
    if not bake_weights:
        var_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), variables)
        args = (var_shapes,) + args
    return jax.export.export(jax.jit(fwd), **kwargs)(*args)


def save_exported(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    """Load a saved artifact; returns the ``Exported`` — run it with
    ``.call(input_ids, image_feat, image_loc, token_type_ids,
    attention_mask, image_attention_mask)``."""
    with open(path, "rb") as f:
        return jax.export.deserialize(f.read())
