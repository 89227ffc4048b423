"""Pallas keep-mask generator for the hidden dropouts.

Hardware decomposition of the hidden-dropout cost (b256 VQA step, v5e,
tools/perf_probe.py): 7.4 ms total = ~4.0 ms XLA RNG bits generation
(RngBitGenerator materialises a uint32 tensor per site — 47 MB written and
re-read at [15360, 768]) + ~3.4 ms mask apply/save traffic. This kernel
replaces only the RNG part: the Mosaic per-core hardware PRNG writes the
bf16 0/1 keep mask directly (24 MB, lane-aligned blocks), and the
multiply/residual/LN chain stays in XLA where it fuses into the matmul
epilogues (the measured-faster arrangement — see CLAUDE.md resln chapter).

Replaces the RNG half of apex's fused dropout kernels
(reference: apex/apex/contrib/csrc/multihead_attn/dropout.cuh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import _interpret, kernels_enabled  # noqa: F401


def _mask_kernel(seed_ref, o_ref, *, rate):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 7919)
    bits = pltpu.bitcast(pltpu.prng_random_bits(o_ref.shape), jnp.uint32)
    thresh = jnp.uint32((1.0 - rate) * 4294967295.0)
    o_ref[:] = (bits < thresh).astype(jnp.bfloat16)


def _row_tile(n: int, cap: int = 1024) -> int:
    rt = min(cap, n)
    while rt > 1 and n % rt:
        rt -= 1
    return rt


def supported(shape) -> bool:
    n = 1
    for s in shape[:-1]:
        n *= s
    d = shape[-1]
    return n >= 8 and d % 128 == 0 and _row_tile(n) >= 8


def pallas_keep_mask(shape, rate: float, seed) -> jax.Array:
    """bf16 0/1 Bernoulli(1-rate) keep mask of ``shape`` (last dim must be
    a lane multiple). ``seed`` is an int32 scalar; same seed reproduces the
    mask within one compiled program (Mosaic PRNG caveat: not across
    recompilations — callers must not regenerate in a backward)."""
    d = shape[-1]
    n = 1
    for s in shape[:-1]:
        n *= s
    rt = _row_tile(n)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_mask_kernel, rate=rate),
        grid=(n // rt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((rt, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.bfloat16),
        interpret=_interpret(),
    )(seed_arr)
    return jax.lax.stop_gradient(out.reshape(shape))
