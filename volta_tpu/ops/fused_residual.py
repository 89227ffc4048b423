"""Fused dropout + residual-add + LayerNorm (Pallas/TPU) with custom VJP.

TPU-native replacement for the hottest non-matmul chain in the gated
encoder: every sublayer ends with ``LN(dropout(dense_out) + residual)``
(reference: volta/encoders.py:398-424, 469-484 — Dropout -> add ->
apex FusedLayerNorm). On v5e this chain costs ~14 ms of the 92 ms VQA
train step when left to XLA (measured by the no-LN / no-dropout ablations
in tools/perf_probe.py); fusing it into one kernel per direction removes
the intermediate HBM round trips and the separate RNG pass.

Forward: one row-tiled kernel draws the Bernoulli keep mask from the
per-core PRNG, applies dropout, adds the residual, normalizes, and emits
(y, dropped-in-o.dtype, keep-mask, mean, rstd). The mask is saved
explicitly (0/1 in o.dtype) so the backward is exact even for elements
that were exactly 0.0 before dropout — the earlier ``od != 0`` recovery
silently dropped their gradient (round-2 advisor finding, now retired).
Mosaic PRNG bits are not reproducible across separately compiled kernels
(see CLAUDE.md), so the backward never regenerates the mask.

Backward: recomputes s = od + x in VMEM, runs the LayerNorm VJP per row,
splits ds into the residual gradient (dx = ds) and the dense-branch
gradient (do = ds * keep / (1-rate)), and emits per-tile partial
dscale/dbias that XLA sums afterwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layers import LN_EPS

_ROW_TILE = 256


def _ln_rows(s, scale, bias, eps):
    mean = jnp.mean(s, axis=-1, keepdims=True)
    sc = s - mean
    var = jnp.mean(sc * sc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = sc * rstd * scale + bias
    return y, mean, rstd


def _fwd_kernel(seed_ref, o_ref, x_ref, scale_ref, bias_ref,
                y_ref, od_ref, keep_ref, mean_ref, rstd_ref, *, rate, eps):
    o = o_ref[:].astype(jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 7919)
        bits = pltpu.bitcast(pltpu.prng_random_bits(o.shape), jnp.uint32)
        keep = 1.0 - rate
        thresh = jnp.uint32(keep * 4294967295.0)
        kept = bits < thresh
        od = jnp.where(kept, o * (1.0 / keep), 0.0)
        keep_ref[:] = kept.astype(keep_ref.dtype)
    else:
        od = o
        keep_ref[:] = jnp.ones_like(o).astype(keep_ref.dtype)
    s = od + x_ref[:].astype(jnp.float32)
    y, mean, rstd = _ln_rows(s, scale_ref[:].astype(jnp.float32),
                             bias_ref[:].astype(jnp.float32), eps)
    y_ref[:] = y.astype(y_ref.dtype)
    od_ref[:] = od.astype(od_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _bwd_kernel(g_ref, od_ref, keep_ref, x_ref, scale_ref, mean_ref,
                rstd_ref, do_ref, dx_ref, dscale_ref, dbias_ref, *, rate):
    g = g_ref[:].astype(jnp.float32)
    od = od_ref[:].astype(jnp.float32)
    s = od + x_ref[:].astype(jnp.float32)
    rstd = rstd_ref[:]
    xhat = (s - mean_ref[:]) * rstd
    gs = g * scale_ref[:].astype(jnp.float32)
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    ds = rstd * (gs - m1 - xhat * m2)
    dx_ref[:] = ds.astype(dx_ref.dtype)
    if rate > 0.0:
        keep = keep_ref[:].astype(jnp.float32)
        do_ref[:] = (ds * keep * (1.0 / (1.0 - rate))).astype(do_ref.dtype)
    else:
        do_ref[:] = ds.astype(do_ref.dtype)
    t, d = g.shape
    dscale_ref[0] = jnp.sum((g * xhat).reshape(t // 8, 8, d), axis=0)
    dbias_ref[0] = jnp.sum(g.reshape(t // 8, 8, d), axis=0)


def _pick_tile(n):
    tile = min(_ROW_TILE, n)
    while tile > 8 and n % tile:
        tile //= 2
    return tile


def _row_blk(tile, d):
    return pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _vec_blk(d):
    return pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)


def _stat_blk(tile):
    return pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _fwd_call(o, x, scale, bias, seed_arr, rate, eps, interpret=False):
    d = o.shape[-1]
    n = o.size // d
    o2 = o.reshape(n, d)
    x2 = x.reshape(n, d)
    tile = _pick_tile(n)
    y, od, keep, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, eps=eps),
        grid=(n // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _row_blk(tile, d), _row_blk(tile, d),
                  _vec_blk(d), _vec_blk(d)],
        out_specs=[_row_blk(tile, d), _row_blk(tile, d), _row_blk(tile, d),
                   _stat_blk(tile), _stat_blk(tile)],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), o.dtype),
            jax.ShapeDtypeStruct((n, d), o.dtype),
            jax.ShapeDtypeStruct((n, d), o.dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed_arr, o2, x2, scale, bias)
    return y.reshape(o.shape), (od, keep, x2, scale, mean, rstd, o.shape)


def _bwd_xla(rate, res, g):
    """XLA backward from the kernel-saved residuals. Measured faster than
    the Pallas bwd kernel at base shapes (tools/microbench_resln.py — the
    bwd is reduction-heavy VPU work XLA schedules well), so it is the
    default; the Pallas bwd stays selectable via ``bwd_impl``."""
    od, keep, x2, scale, mean, rstd, orig_shape = res
    g2 = g.reshape(x2.shape).astype(jnp.float32)
    od32 = od.astype(jnp.float32)
    s = od32 + x2.astype(jnp.float32)
    xhat = (s - mean) * rstd
    gs = g2 * scale.astype(jnp.float32)
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    ds = rstd * (gs - m1 - xhat * m2)
    dx = ds.astype(g.dtype)
    if rate > 0.0:
        do = (ds * keep.astype(jnp.float32) *
              (1.0 / (1.0 - rate))).astype(g.dtype)
    else:
        do = dx
    dscale = jnp.sum(g2 * xhat, axis=0)
    dbias = jnp.sum(g2, axis=0)
    import numpy as _np

    dseed = _np.zeros((1,), dtype=jax.dtypes.float0)
    return (do.reshape(orig_shape), dx.reshape(orig_shape), dscale, dbias,
            dseed)


def _bwd_call(rate, eps, interpret, bwd_impl, res, g):
    if bwd_impl == "xla":
        return _bwd_xla(rate, res, g)
    od, keep, x2, scale, mean, rstd, orig_shape = res
    n, d = x2.shape
    g2 = g.reshape(n, d)
    tile = _pick_tile(n)
    ntiles = n // tile
    do, dx, dscale_p, dbias_p = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate),
        grid=(ntiles,),
        in_specs=[_row_blk(tile, d), _row_blk(tile, d), _row_blk(tile, d),
                  _row_blk(tile, d),
                  _vec_blk(d), _stat_blk(tile), _stat_blk(tile)],
        out_specs=[
            _row_blk(tile, d), _row_blk(tile, d),
            pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), g.dtype),
            jax.ShapeDtypeStruct((n, d), g.dtype),
            jax.ShapeDtypeStruct((ntiles, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, 8, d), jnp.float32),
        ],
        interpret=interpret,
    )(g2, od, keep, x2, scale, mean, rstd)
    import numpy as _np

    dseed = _np.zeros((1,), dtype=jax.dtypes.float0)
    return (do.reshape(orig_shape), dx.reshape(orig_shape),
            jnp.sum(dscale_p, axis=(0, 1)), jnp.sum(dbias_p, axis=(0, 1)),
            dseed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _dropout_residual_ln(o, x, scale, bias, seed_arr, rate, eps, interpret,
                         bwd_impl):
    return _fwd_call(o, x, scale, bias, seed_arr, rate, eps, interpret)[0]


def _fwd_rule(o, x, scale, bias, seed_arr, rate, eps, interpret, bwd_impl):
    return _fwd_call(o, x, scale, bias, seed_arr, rate, eps, interpret)


_dropout_residual_ln.defvjp(_fwd_rule, _bwd_call)


def dropout_residual_ln(o, x, scale, bias, seed, rate: float,
                        eps: float = LN_EPS, interpret: bool = False,
                        bwd_impl: str = "xla"):
    """``LayerNorm(dropout(o) + x)`` in one fused kernel per direction.

    ``o`` is the dense-branch output, ``x`` the residual stream (same
    shape, last dim normalized). ``seed`` is an int32 scalar; the kernel
    mixes in its row-tile program id. Shapes must satisfy
    ``supported(o)``; callers fall back to the XLA composition otherwise.
    ``bwd_impl`` selects the backward: "xla" (default, faster at base
    shapes) recomputes the LN VJP in XLA from the kernel-saved residuals;
    "pallas" uses the fused backward kernel.
    """
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    return _dropout_residual_ln(o, x, scale, bias, seed_arr, float(rate),
                                float(eps), interpret, bwd_impl)


def supported(o) -> bool:
    d = o.shape[-1]
    n = o.size // d
    # Mosaic's native sublane tile is 8 rows for fp32 but 16 for 16-bit
    # dtypes; require the matching multiple so tiny bf16 inputs don't hit
    # an unlowerable shape on hardware.
    rows = 16 if jnp.dtype(o.dtype).itemsize == 2 else 8
    return n >= rows and n % rows == 0 and d % 128 == 0
