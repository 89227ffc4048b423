"""int8 dense-layer quantization for serving.

Weight+activation int8 with int32 accumulation — the v5e MXU's int8 mode
has 2x the bf16 peak (394 vs 197 TOPS), so a compute-bound serving
forward can approach 2x. Weights are quantized once, offline, per output
channel (symmetric, scale = max|w|/127 over the input axis); activations
are quantized per token at run time (dynamic symmetric). The matmul
accumulates in int32 and the result is rescaled to bf16 by the outer
product of the two scales.

No reference analogue (the reference serves fp32 torch); this is a
serving-only extension. Training and eval parity paths are untouched:
quantization is applied by intercepting ``nn.Dense`` calls at export
time (``flax.linen.intercept_methods``), so the model code and its
parameter tree never change — the artifact just takes the quantized
bundle instead of the raw variables.

Scope note: per-token dynamic activation quant keeps the MLM-head-free
task forwards close to the bf16 logits (tests/test_int8_dense.py;
hardware b1024 ctrl_uniter VQA at random init: max|dlogit|=0.1875,
mean 0.027, top1-agreement 0.901 — at random init the logits are
near-tied so argmax agreement is a worst case, `logs/
bench_serving_int8_r3.log`). Measured end-to-end the dynamic-quant
artifact LOSES to bf16 (8,821 vs 10,427 samples/s at b1024): the
per-token abs-max reduction + requant breaks XLA's epilogue fusion
around every matmul, and `tools/int8_roofline.py` shows the dynamic
chain reaching only 146.8 TOPS vs the static-requant chain's 191.9
(bf16: 135.3). See ``calibrate_activation_scales`` /
``static_scales`` for the static path that realizes the win.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

_DN = (((1,), (0,)), ((), ()))  # [m,k] x [k,n]


def quantize_kernel(w) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a [in, out] kernel."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dense_apply(x, q, scale, bias, out_dtype=jnp.bfloat16,
                     a_scale=None):
    """y = dequant(int8(x) @ q) + bias.

    ``x``: [..., in] float; ``q``: int8 [in, out]; ``scale``: f32 [out].
    ``a_scale=None`` → dynamic per-token activation scales (a max|x|
    reduction per call — robust, but the reduction is an extra HBM pass
    that breaks XLA's epilogue fusion; measured SLOWER than bf16
    end-to-end). A scalar ``a_scale`` (from
    :func:`calibrate_activation_scales`) → static requant: the quantize
    step is a fusable elementwise op and the chain reaches the MXU's
    int8 mode (tools/int8_roofline.py: 191.9 vs bf16's 135.3 TOPS).
    """
    lead = x.shape[:-1]
    xf = jnp.asarray(x, jnp.float32).reshape(-1, x.shape[-1])
    a = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0 + 1e-12 \
        if a_scale is None else jnp.asarray(a_scale, jnp.float32)
    xq = jnp.clip(jnp.round(xf / a), -127, 127).astype(jnp.int8)
    acc = lax.dot_general(xq, q, _DN, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (a * scale)
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype).reshape(*lead, q.shape[-1])


def calibrate_activation_scales(apply_fn, variables, batches):
    """Per-Dense static activation scales from calibration batches.

    ``apply_fn(variables, *batch)`` must run the model's forward via
    ``model.apply`` (any signature — Dense calls are observed through a
    flax interceptor regardless of the call path). Returns
    {'/'-joined module path: f32 scale} where scale = max|x| / 127 over
    every calibration batch. The observation forward is jitted once, so
    calibration costs one compile + one forward per batch.
    """
    records = {}

    def interceptor(next_fn, args, kwargs, context):
        if (isinstance(context.module, nn.Dense)
                and context.method_name == "__call__"):
            key = "/".join(context.module.path)
            m = jnp.max(jnp.abs(jnp.asarray(args[0], jnp.float32)))
            records[key] = jnp.maximum(records[key], m) \
                if key in records else m
        return next_fn(*args, **kwargs)

    def run(variables_, *a):
        records.clear()
        with nn.intercept_methods(interceptor):
            apply_fn(variables_, *a)
        return dict(records)

    jrun = jax.jit(run)
    out = None
    for batch in batches:
        r = {k: float(v) for k, v in jrun(variables, *batch).items()}
        if out is None:
            out = r
        else:
            # merge over the union of keys: different batches (e.g. of
            # different task shapes) may exercise different Dense sets
            for k, v in r.items():
                out[k] = max(out.get(k, 0.0), v)
    if out is None:
        raise ValueError(
            "calibrate_activation_scales: empty `batches` iterable — at "
            "least one calibration batch is required")
    return {k: v / 127.0 + 1e-12 for k, v in out.items()}


def _walk(tree, path=()):
    if isinstance(tree, dict):
        if "kernel" in tree and getattr(tree["kernel"], "ndim", 0) == 2:
            yield path, tree
        else:
            for k, v in tree.items():
                yield from _walk(v, path + (k,))


def quantize_variables(variables, residual_dtype=None,
                       act_scales=None) -> Dict[str, Any]:
    """Transform a trained variable dict into the int8 serving bundle.

    Every 2-D ``kernel`` (i.e. every ``nn.Dense``) is replaced by
    (int8 kernel, per-channel scale, bias) under ``bundle["int8"]``,
    keyed by the module's '/'-joined path; everything else (embeddings,
    LayerNorms, 3-D decoder weights) stays in ``bundle["params"]``.

    ``residual_dtype`` (e.g. ``jnp.bfloat16``) additionally casts those
    remaining float params for shipping — numerics-neutral when the
    model's compute dtype is the same (flax casts them there anyway);
    ctrl_uniter's 452 MiB fp32 variables become a 182 MiB bundle with
    int8 kernels alone, 137 MiB with bf16 residuals.

    ``act_scales`` (from :func:`calibrate_activation_scales`) bakes a
    static per-tensor activation scale into each entry — the serving
    forward then requants statically instead of the per-token dynamic
    max|x| reduction.
    """
    params = jax.tree.map(lambda x: x, variables["params"])  # shallow copy
    table = {}
    for path, leaf in list(_walk(params)):
        q, scale = quantize_kernel(leaf["kernel"])
        key = "/".join(path)
        table[key] = {
            "q": q, "scale": scale,
            "bias": jnp.asarray(leaf["bias"], jnp.float32)
            if "bias" in leaf else None,
            # Dense modules not exercised during calibration (e.g. other
            # tasks' classifiers) keep the dynamic per-token path.
            "a": jnp.float32(act_scales[key])
            if act_scales is not None and key in act_scales else None,
        }
        node = params
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = {}  # prune the fp kernel/bias from the upload
    if residual_dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(residual_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    out = dict(variables)
    out["params"] = params
    out["int8"] = table
    return out


def make_interceptor(table: Dict[str, Any]):
    """A flax method interceptor that reroutes quantized Dense calls."""

    def interceptor(next_fn, args, kwargs, context):
        if (isinstance(context.module, nn.Dense)
                and context.method_name == "__call__"):
            key = "/".join(context.module.path)
            entry = table.get(key)
            if entry is not None:
                return int8_dense_apply(
                    args[0], entry["q"], entry["scale"], entry["bias"],
                    out_dtype=context.module.dtype or jnp.float32,
                    a_scale=entry.get("a"))
        return next_fn(*args, **kwargs)

    return interceptor


def apply_quantized(model, bundle, *args, **kwargs):
    """``model.apply`` with the int8 bundle from :func:`quantize_variables`."""
    table = bundle["int8"]
    variables = {k: v for k, v in bundle.items() if k != "int8"}
    with nn.intercept_methods(make_interceptor(table)):
        return model.apply(variables, *args, **kwargs)
