"""Fused LayerNorm (Pallas/TPU) with custom VJP.

TPU-native replacement for the reference's apex ``fused_layer_norm_cuda``
extension (reference: apex/csrc/layer_norm_cuda_kernel.cu, wrapped at
apex/apex/normalization/fused_layer_norm.py:70). Numerics are TF-style:
epsilon inside the square root, eps=1e-12, statistics in float32.

Forward and backward each run as a single Pallas kernel over row tiles held
in VMEM; the backward emits per-tile partial dscale/dbias that are summed by
XLA afterwards. Falls back to the plain-XLA implementation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layers import layer_norm_ref, LN_EPS

_ROW_TILE = 256


def _fwd_kernel(x_ref, scale_ref, bias_ref, o_ref, mean_ref, rstd_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    o_ref[:] = (xhat * scale_ref[:].astype(jnp.float32)
                + bias_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _bwd_kernel(g_ref, x_ref, scale_ref, mean_ref, rstd_ref,
                dx_ref, dscale_ref, dbias_ref):
    g = g_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    rstd = rstd_ref[:]
    xhat = (x - mean_ref[:]) * rstd
    gs = g * scale_ref[:].astype(jnp.float32)
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rstd * (gs - m1 - xhat * m2)).astype(dx_ref.dtype)
    # per-tile partials kept as (8, d) to satisfy TPU sublane tiling; the
    # caller sums over tiles and sublanes
    t, d = g.shape
    dscale_ref[0] = jnp.sum((g * xhat).reshape(t // 8, 8, d), axis=0)
    dbias_ref[0] = jnp.sum(g.reshape(t // 8, 8, d), axis=0)


def _rows(x):
    d = x.shape[-1]
    n = x.size // d
    return x.reshape(n, d), n, d


def _fwd_call(x, scale, bias, eps):
    x2, n, d = _rows(x)
    tile = min(_ROW_TILE, n)
    grid = (pl.cdiv(n, tile),)
    out, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
    )(x2, scale, bias)
    return out.reshape(x.shape), (x2, scale, mean, rstd, x.shape)


def _bwd_call(res, g):
    x2, scale, mean, rstd, orig_shape = res
    n, d = x2.shape
    g2 = g.reshape(n, d)
    tile = min(_ROW_TILE, n)
    ntiles = pl.cdiv(n, tile)
    dx, dscale_p, dbias_p = pl.pallas_call(
        _bwd_kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), g.dtype),
            jax.ShapeDtypeStruct((ntiles, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, 8, d), jnp.float32),
        ],
    )(g2, x2, scale, mean, rstd)
    dscale = jnp.sum(dscale_p, axis=(0, 1))
    dbias = jnp.sum(dbias_p, axis=(0, 1))
    return dx.reshape(orig_shape), dscale, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_layer_norm(x, scale, bias, eps):
    return _fwd_call(x, scale, bias, eps)[0]


def _pallas_ln_fwd(x, scale, bias, eps):
    return _fwd_call(x, scale, bias, eps)


def _pallas_ln_bwd(eps, res, g):
    return _bwd_call(res, g)


_pallas_layer_norm.defvjp(_pallas_ln_fwd, _pallas_ln_bwd)


def fused_layer_norm(x, scale, bias, eps: float = LN_EPS):
    """LayerNorm over the last axis; Pallas on TPU, XLA elsewhere.

    Row count must be a multiple of the tile only for the Pallas path; ragged
    shapes fall back to XLA (still fused by the compiler).
    """
    d = x.shape[-1]
    n = x.size // d
    tile = min(_ROW_TILE, n)
    if (jax.default_backend() == "tpu" and n % tile == 0 and tile % 8 == 0
            and d % 128 == 0 and n >= 8):
        return _pallas_layer_norm(x, scale, bias, eps)
    return layer_norm_ref(x, scale, bias, eps)
