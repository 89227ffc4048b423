"""Pallas fused joint-softmax attention kernel for TPU.

TPU-native counterpart of apex's fused multihead-attention CUDA kernels
(reference: apex/apex/contrib/csrc/multihead_attn/) specialised to VOLTA's
gated bimodal attention: the query stream attends over the concatenated
[text ‖ vision] key/value axis with a joint softmax
(reference: volta/encoders.py:285-314).

Sequence lengths here are short (≤ ~128 query, ≤ ~256 joint key), so the
whole (Lq, Lk) score tile lives in VMEM — no online-softmax streaming needed.
The grid walks (batch-tile, head); each program does QK^T, bias add, softmax
and PV in one VMEM round trip, eliminating the HBM materialisation of the
[B, H, Lq, Lk] probability tensor that the XLA path incurs.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = [False]


@contextlib.contextmanager
def interpret_mode():
    """Run the attention kernels under the Mosaic TPU *simulator* on CPU
    hosts (``pltpu.InterpretParams``). This is how the TP shard_map wrappers
    (parallel/tp.py) get executed with the real kernels in CI and in the
    multichip dryrun — no TPU required. Caveat: the simulator's
    ``prng_random_bits`` returns all-zero bits, so dropout masks degenerate
    to keep-everything; equivalence tests must compare at rate 0 (exact) or
    treat rate>0 as plumbing-only coverage. The RNG itself is verified
    off-device at the bit level in tests/test_tp_dropout_rng.py (seed
    disjointness across device/program grids incl. int32 wraparound +
    stride-offset whiteness) and on hardware by tools/validate_tpu.py
    check 2c (TP seed offsets change the mask set, keep rate preserved)."""
    prev = _INTERPRET[0]
    _INTERPRET[0] = True
    try:
        yield
    finally:
        _INTERPRET[0] = prev


def _interpret():
    return pltpu.InterpretParams() if _INTERPRET[0] else False


def kernels_enabled() -> bool:
    """Kernel call sites gate on this: real TPU backend, or the simulator
    explicitly switched on via interpret_mode()."""
    return _INTERPRET[0] or jax.default_backend() == "tpu"


# trace-time kernel counter: lets callers (e.g. __graft_entry__'s multichip
# dryrun) assert the Pallas path was actually traced rather than silently
# falling back to XLA when a gate condition drifts
TRACE_COUNT = [0]


def _mix_seed(seed_ref):
    hi = pl.program_id(0)
    bi = pl.program_id(1)
    return seed_ref[0] + hi * 7919 + bi * 104729


def _probs_arr(q, k, bias, scale):
    """Softmax probs from [bb, Lq, D] x [bb, Lk, D] arrays + [bb, 1, Lk]
    bias -> [bb, Lq, Lk] float32 (in-VMEM; shared by the head-major and
    natural-layout kernel bodies)."""
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [bb, Lq, Lk]
    scores = scores * scale + bias.astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _probs(q_ref, k_ref, bias_ref, scale):
    return _probs_arr(q_ref[0], k_ref[0], bias_ref[:], scale)


def _keep_mask(shape, rate):
    """Bernoulli keep mask scaled by 1/keep from the per-core PRNG (the
    caller seeds it; fwd and bwd regenerate the identical mask)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    keep = 1.0 - rate
    thresh = jnp.uint32(keep * 4294967295.0)
    return jnp.where(bits < thresh, 1.0 / keep, 0.0).astype(jnp.float32)


def _attn_dropout_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref,
                             o_ref, m_ref, *, scale, rate):
    """Computes dropout(softmax(qk+bias)) @ v and emits the Bernoulli keep
    mask as bfloat16 0/1 (Mosaic PRNG bit order is not reproducible across
    different kernels, so the backward consumes the saved mask — still 2x
    smaller than materialising float32 probabilities, which never leave
    VMEM in either direction)."""
    pltpu.prng_seed(_mix_seed(seed_ref))
    probs = _probs(q_ref, k_ref, bias_ref, scale)
    keep = _keep_mask(probs.shape, rate)
    probs = probs * keep
    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0],
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)
    m_ref[0] = (keep > 0).astype(jnp.bfloat16)


def _keep01(shape, rate):
    """Bernoulli keep mask as bf16 0/1 (unscaled) from the per-core PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32((1.0 - rate) * 4294967295.0)
    return (bits < thresh).astype(jnp.bfloat16)


def _attn_dropout_fwd_hm_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref,
                                o_ref, m_ref, hm0_ref, hm1_ref, *, scale,
                                rate, hidden_rate):
    """Same as _attn_dropout_fwd_kernel, but additionally emits two
    hidden-dropout keep masks shaped like the per-head context: one for this
    sublayer's output-dense dropout, one for the following feed-forward's.
    The draws piggyback on the already-seeded per-program PRNG, replacing
    two full-tensor XLA RNG passes per attn+FFN sublayer pair; the VPU draws
    overlap the MXU matmuls."""
    pltpu.prng_seed(_mix_seed(seed_ref))
    probs = _probs(q_ref, k_ref, bias_ref, scale)
    keep = _keep_mask(probs.shape, rate)
    probs = probs * keep
    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0],
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)
    m_ref[0] = (keep > 0).astype(jnp.bfloat16)
    hm0_ref[0] = _keep01(out.shape, hidden_rate)
    hm1_ref[0] = _keep01(out.shape, hidden_rate)


def _dropout_bwd_math(q, k, v, bias, g, mask01, scale, rate):
    """Attention-with-dropout VJP on [bb, L, D] arrays; probs recomputed in
    VMEM, the keep mask read back from the forward's compact output."""
    probs = _probs_arr(q, k, bias, scale)
    mask = mask01.astype(jnp.float32) * (1.0 / (1.0 - rate))
    pd = probs * mask
    g = g.astype(jnp.float32)
    v = v.astype(jnp.float32)
    dv = jax.lax.dot_general(pd, g, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * mask
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    k = k.astype(jnp.float32)
    q = q.astype(jnp.float32)
    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    return dq, dk, dv


def _attn_dropout_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, m_ref,
                             dq_ref, dk_ref, dv_ref, *, scale, rate):
    dq, dk, dv = _dropout_bwd_math(q_ref[0], k_ref[0], v_ref[0], bias_ref[:],
                                   g_ref[0], m_ref[0], scale, rate)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _head_major(x):
    return jnp.transpose(x, (2, 0, 1, 3))


def _pick_tile(b, batch_tile, lq=64, lk=64, d=64):
    """Largest divisor tile of b <= batch_tile whose (bwd) working set fits
    comfortably in VMEM (~16MB/core; target <= 10MB)."""
    def vmem_bytes(bt):
        # probs/mask/ds tiles (f32) + q/k/v/g/dq/dk/dv tiles (<=f32)
        return bt * (4 * lq * lk * 4 + (3 * lq + 4 * lk) * d * 4)

    bt = min(batch_tile, b)
    while bt > 1 and (b % bt or vmem_bytes(bt) > 10 * 2**20):
        bt //= 2
    while b % bt:
        bt -= 1
    return max(bt, 1)


def _blk(bt, d):
    return lambda l: pl.BlockSpec((1, bt, l, d),
                                  lambda hi, bi: (hi, bi, 0, 0),
                                  memory_space=pltpu.VMEM)


def _mask_blk(bt, lq, lk):
    return pl.BlockSpec((1, bt, lq, lk), lambda hi, bi: (hi, bi, 0, 0),
                        memory_space=pltpu.VMEM)


def _bias_blk(bt, lk):
    return pl.BlockSpec((bt, 1, lk), lambda hi, bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)


def pallas_dropout_attention(q, k, v, bias, scale, rate, seed,
                             batch_tile: int = 16, natural: bool = False):
    """Training-path attention with in-kernel dropout on the probabilities.

    ``seed`` is an int32 scalar (derived from the step's dropout rng). The
    float32 probability tensor never reaches HBM; only the compact keep mask
    is saved for the backward kernel. With ``natural`` the kernels block the
    [B,L,H,D] operands directly (no head-major layout copies — see the
    natural-layout section below).
    """
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    if natural:
        # the cores tile with _pick_tile_nat; batch_tile is just the cap
        return _pallas_dropout_attention_nat(q, k, v, bias, seed_arr, scale,
                                             rate, batch_tile)
    bt = _pick_tile(q.shape[0], batch_tile, q.shape[1], k.shape[1],
                    q.shape[3])
    return _pallas_dropout_attention(q, k, v, bias, seed_arr, scale, rate,
                                     bt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _pallas_dropout_attention(q, k, v, bias, seed_arr, scale, rate, bt):
    out, _ = _dropout_fwd_impl(q, k, v, bias, seed_arr, scale, rate, bt)
    return out


def _dropout_fwd_core(qh, kh, vh, bias_b, seed_arr, scale, rate, bt):
    """Head-major core: qh/kh/vh [H,B,L,D], bias_b [B,1,Lk] ->
    (out [H,B,Lq,D], mask [H,B,Lq,Lk])."""
    TRACE_COUNT[0] += 1
    h, b, lq, d = qh.shape
    lk = kh.shape[2]
    blk = _blk(bt, d)
    return pl.pallas_call(
        functools.partial(_attn_dropout_fwd_kernel, scale=scale, rate=rate),
        grid=(h, b // bt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk(lq), blk(lk), blk(lk), _bias_blk(bt, lk)],
        out_specs=[blk(lq), _mask_blk(bt, lq, lk)],
        out_shape=[jax.ShapeDtypeStruct((h, b, lq, d), qh.dtype),
                   jax.ShapeDtypeStruct((h, b, lq, lk), jnp.bfloat16)],
        interpret=_interpret(),
    )(seed_arr, qh, kh, vh, bias_b)


def _bias_bcast(bias, b, lk):
    return jnp.broadcast_to(bias.astype(jnp.float32),
                            (b, 1, 1, lk)).reshape(b, 1, lk)


def _dropout_fwd_impl(q, k, v, bias, seed_arr, scale, rate, bt):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    out, mask = _dropout_fwd_core(_head_major(q), _head_major(k),
                                  _head_major(v), _bias_bcast(bias, b, lk),
                                  seed_arr, scale, rate, bt)
    return jnp.transpose(out, (1, 2, 0, 3)), mask


def _dropout_fwd_rule(q, k, v, bias, seed_arr, scale, rate, bt):
    out, mask = _dropout_fwd_impl(q, k, v, bias, seed_arr, scale, rate, bt)
    return out, (q, k, v, bias, mask)


def _dropout_bwd_core(qh, kh, vh, bias_b, gh, mask, scale, rate, bt):
    """Head-major backward core -> (dqh, dkh, dvh) in [H,B,L,D]."""
    h, b, lq, d = qh.shape
    lk = kh.shape[2]
    blk = _blk(bt, d)
    return pl.pallas_call(
        functools.partial(_attn_dropout_bwd_kernel, scale=scale, rate=rate),
        grid=(h, b // bt),
        in_specs=[blk(lq), blk(lk), blk(lk), _bias_blk(bt, lk), blk(lq),
                  _mask_blk(bt, lq, lk)],
        out_specs=[blk(lq), blk(lk), blk(lk)],
        out_shape=[
            jax.ShapeDtypeStruct((h, b, lq, d), qh.dtype),
            jax.ShapeDtypeStruct((h, b, lk, d), kh.dtype),
            jax.ShapeDtypeStruct((h, b, lk, d), vh.dtype),
        ],
        interpret=_interpret(),
    )(qh, kh, vh, bias_b, gh, mask)


def _dropout_bwd_rule(scale, rate, bt, res, g):
    import numpy as _np

    q, k, v, bias, mask = res
    b, lq, h, d = q.shape
    lk = k.shape[1]
    qh, kh, vh, gh = (_head_major(x) for x in (q, k, v, g))
    dq, dk, dv = _dropout_bwd_core(qh, kh, vh, _bias_bcast(bias, b, lk),
                                   gh, mask, scale, rate, bt)
    back = lambda x: jnp.transpose(x, (1, 2, 0, 3))
    dseed = _np.zeros((1,), dtype=jax.dtypes.float0)
    return (back(dq), back(dk), back(dv), jnp.zeros_like(bias), dseed)


_pallas_dropout_attention.defvjp(_dropout_fwd_rule, _dropout_bwd_rule)


# -------------------------------------------- head-major layout (no xpose)
def dropout_attention_head_major(qh, kh, vh, bias, scale, rate, seed,
                                 batch_tile: int = 16):
    """Dropout attention on already head-major [H,B,L,D] operands: no
    layout ops in either direction. Used by tools/microbench_attn_layout.py
    to price the [B,L,H,D]<->[H,B,L,D] transposes the standard entry point
    pays around every kernel call."""
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    h, b, lq, d = qh.shape
    bt = _pick_tile(b, batch_tile, lq, kh.shape[2], d)
    return _dropout_attention_hm_layout(qh, kh, vh, bias, seed_arr, scale,
                                        rate, bt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _dropout_attention_hm_layout(qh, kh, vh, bias, seed_arr, scale, rate,
                                 bt):
    out, _ = _dropout_fwd_core(qh, kh, vh,
                               _bias_bcast(bias, qh.shape[1], kh.shape[2]),
                               seed_arr, scale, rate, bt)
    return out


def _hm_layout_fwd(qh, kh, vh, bias, seed_arr, scale, rate, bt):
    out, mask = _dropout_fwd_core(qh, kh, vh,
                                  _bias_bcast(bias, qh.shape[1],
                                              kh.shape[2]),
                                  seed_arr, scale, rate, bt)
    return out, (qh, kh, vh, bias, mask)


def _hm_layout_bwd(scale, rate, bt, res, g):
    import numpy as _np

    qh, kh, vh, bias, mask = res
    dq, dk, dv = _dropout_bwd_core(qh, kh, vh,
                                   _bias_bcast(bias, qh.shape[1],
                                               kh.shape[2]),
                                   g, mask, scale, rate, bt)
    dseed = _np.zeros((1,), dtype=jax.dtypes.float0)
    return (dq, dk, dv, jnp.zeros_like(bias), dseed)


_dropout_attention_hm_layout.defvjp(_hm_layout_fwd, _hm_layout_bwd)


# ------------------------------------------- natural [B, L, H, D] layout
# The head-major kernels require [H,B,L,D] operands, so XLA materialises a
# layout copy (~0.16 ms at headline shapes) for every q/k/v/g/context at
# every attention site — ~13 ms/step (15%) total, per tools/analyze_trace.py
# on the round-3 trace. (tools/microbench_attn_layout.py had called the
# transposes free, but it reused one q/k/v for all 12 sites, so XLA CSE'd
# the transpose once — a 12x under-count.)
#
# Mosaic forbids the obvious fix — blocking [B,L,H,D] with the head dim
# squeezed into the grid — because a squeezed (size-1) block in the
# second-to-minor position violates the (8,128) block-tiling rule whenever
# D < 128. So these variants never put H next to the minor dim at all: the
# [B,L,H,D] operands are viewed as 3-D [B, L, H*D] (a free bitcast — exactly
# the dense-projection output layout), blocked (bt, L, H*D) over a batch-only
# grid, and the per-head [bt, L, D] tiles are carved out *inside* the kernel
# as static lane slices of the loaded block. Odd-head slices cost a VPU lane
# rotate in VMEM; that replaces an HBM round trip per operand per site. The
# per-head outputs are concatenated back to [bt, L, H*D] and stored once, so
# QKV projection outputs feed the kernel with zero layout ops in either
# direction, and the cotangents leave the same way. The saved keep-mask is
# [B, H, Lq, Lk] (kernel-internal format, contiguous both ways).

def _nat3_blk(bt, l, hd):
    return pl.BlockSpec((bt, l, hd), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)


def _nat_mask_blk(bt, h, lq, lk):
    return pl.BlockSpec((bt, h, lq, lk), lambda bi: (bi, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _nat_bias_blk(bt, lk):
    return pl.BlockSpec((bt, 1, lk), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)


def _pick_tile_nat(b, batch_tile, lq, lk, hd, h):
    """Largest divisor tile of b <= batch_tile whose estimated backward
    VMEM working set stays <= 13MB of the 16MB scoped limit.

    The estimate itemises what the batched-head backward actually holds
    at peak: the double-buffered HBM block refs, the marshalled [H*bt]
    bf16 operand copies, the float32 casts of q/k/v/g inside the VJP
    math, five score-shaped float32 temporaries (probs, scaled mask, pd,
    dp, ds), and the bf16 keep mask. Calibration against Mosaic's
    reported scoped stack: L=37 bt=8 est 16.1M vs real 17.62M OOM; L=23
    bt=16 real 16.86M OOM; L=60 bt=4 est 14.5M compiled at b256 but the
    SAME block shapes hit 16.14M (OOM by 148K) in the b512 program —
    razor-edge tiles flip with XLA fusion layout, hence the 13MB budget.
    The resulting bt=2 at the L=60 headline measures 72.18 ms vs bt=4's
    72.03 (noise): the smaller tile is free, the safety is not."""
    def vmem_bytes(bt):
        io = bt * (3 * lq + 4 * lk) * hd * 2      # bf16 q/g/dq + k/v/dk/dv
        copies = io                               # marshalled bh operands
        casts = bt * 2 * (lq + lk) * hd * 4       # f32 casts in bwd math
        scores = 5 * bt * h * lq * lk * 4         # probs/mask/pd/dp/ds f32
        mask = bt * h * lq * lk * 2               # bf16 keep mask
        return 2 * io + copies + casts + scores + mask

    # halving exits at bt==1 or a divisor of b that fits the budget
    bt = min(batch_tile, b)
    while bt > 1 and (b % bt or vmem_bytes(bt) > 13 * 2**20):
        bt //= 2
    return max(bt, 1)


def _attn_dropout_fwd_kernel_nat(seed_ref, q_ref, k_ref, v_ref, bias_ref,
                                 o_ref, m_ref, *, scale, rate, heads):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 104729)
    bias = bias_ref[:].astype(jnp.float32)
    q3, k3, v3 = q_ref[:], k_ref[:], v_ref[:]
    d = q3.shape[-1] // heads
    outs = []
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        probs = _probs_arr(q3[..., sl], k3[..., sl], bias, scale)
        keep = _keep_mask(probs.shape, rate)
        probs = probs * keep
        out = jax.lax.dot_general(
            probs.astype(v3.dtype), v3[..., sl],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append(out.astype(o_ref.dtype))
        m_ref[:, hh] = (keep > 0).astype(jnp.bfloat16)
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def _attn_dropout_bwd_kernel_nat(q_ref, k_ref, v_ref, bias_ref, g_ref,
                                 m_ref, dq_ref, dk_ref, dv_ref, *, scale,
                                 rate, heads):
    bias = bias_ref[:].astype(jnp.float32)
    q3, k3, v3, g3 = q_ref[:], k_ref[:], v_ref[:], g_ref[:]
    d = q3.shape[-1] // heads
    dqs, dks, dvs = [], [], []
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        dq, dk, dv = _dropout_bwd_math(q3[..., sl], k3[..., sl], v3[..., sl],
                                       bias, g3[..., sl], m_ref[:, hh],
                                       scale, rate)
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
    dq_ref[:] = jnp.concatenate(dqs, axis=-1)
    dk_ref[:] = jnp.concatenate(dks, axis=-1)
    dv_ref[:] = jnp.concatenate(dvs, axis=-1)


# Batched-head kernel bodies (DEFAULT): compute all heads with ONE
# bt*H-batched dot_general per matmul instead of the unrolled per-head
# loop — the per-head [L, D] tiles underfill the MXU at small L, and the
# single big softmax/mask pass vectorises better on the VPU. The in-VMEM
# marshalling is per-head lane slices (the same rotate the unrolled loop
# pays) stacked along a new MAJOR axis (Mosaic rejects the direct
# [bt,L,H,D] lane-split shape cast, and int-indexing arrays lowers to an
# unsupported gather — use lax.slice_in_dim/index_in_dim). Hardware A/B on
# the b256 VQA step: 71.75 ms vs 77.15 unrolled (+7.5%) -> 3,568 pairs/s
# (logs/hw_natbh_ab4.log). The unrolled bodies stay for A/B via
# tools/perf_probe.py --variants natloop.
NAT_BATCHED_HEADS = [True]


def _to_bh(x3, heads):
    """[bt, L, H*D] -> [H*bt, L, D] in VMEM: per-head lane slices (the same
    rotate the unrolled loop pays) stacked along a new MAJOR axis — Mosaic
    rejects the direct [bt,L,H,D] lane-split shape cast, major stacking it
    accepts."""
    bt, l, hd = x3.shape
    d = hd // heads
    return jnp.concatenate(
        [jnp.expand_dims(jax.lax.slice_in_dim(x3, hh * d, (hh + 1) * d, 1,
                                              axis=2), 0)
         for hh in range(heads)], axis=0).reshape(heads * bt, l, d)


def _from_bh(x3, bt, heads):
    """[H*bt, L, D] -> [bt, L, H*D] (major split + per-head lane concat)."""
    _, l, d = x3.shape
    x4 = x3.reshape(heads, bt, l, d)
    return jnp.concatenate(
        [jax.lax.index_in_dim(x4, hh, 0, keepdims=False)
         for hh in range(heads)], axis=-1)


def _bh_bias(bias3, bt, heads, lk):
    return jnp.broadcast_to(bias3[None], (heads, bt, 1, lk)).reshape(
        heads * bt, 1, lk)


def _attn_dropout_fwd_kernel_nat_bh(seed_ref, q_ref, k_ref, v_ref, bias_ref,
                                    o_ref, m_ref, *, scale, rate, heads):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 104729)
    bt, lk = q_ref.shape[0], k_ref.shape[1]
    qb = _to_bh(q_ref[:], heads)
    kb = _to_bh(k_ref[:], heads)
    vb = _to_bh(v_ref[:], heads)
    probs = _probs_arr(qb, kb, _bh_bias(bias_ref[:], bt, heads, lk), scale)
    keep = _keep_mask(probs.shape, rate)
    probs = probs * keep
    out = jax.lax.dot_general(
        probs.astype(vb.dtype), vb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = _from_bh(out, bt, heads).astype(o_ref.dtype)
    keep4 = (keep > 0).astype(jnp.bfloat16).reshape(
        (heads, bt) + keep.shape[1:])
    for hh in range(heads):
        m_ref[:, hh] = jax.lax.index_in_dim(keep4, hh, 0, keepdims=False)


def _attn_dropout_bwd_kernel_nat_bh(q_ref, k_ref, v_ref, bias_ref, g_ref,
                                    m_ref, dq_ref, dk_ref, dv_ref, *, scale,
                                    rate, heads):
    bt, lk = q_ref.shape[0], k_ref.shape[1]
    qb = _to_bh(q_ref[:], heads)
    kb = _to_bh(k_ref[:], heads)
    vb = _to_bh(v_ref[:], heads)
    gb = _to_bh(g_ref[:], heads)
    mask = jnp.concatenate(
        [jnp.expand_dims(m_ref[:, hh], 0) for hh in range(heads)],
        axis=0).reshape((heads * bt,) + m_ref.shape[2:])
    dq, dk, dv = _dropout_bwd_math(
        qb, kb, vb, _bh_bias(bias_ref[:], bt, heads, lk), gb, mask,
        scale, rate)
    dq_ref[:] = _from_bh(dq, bt, heads).astype(dq_ref.dtype)
    dk_ref[:] = _from_bh(dk, bt, heads).astype(dk_ref.dtype)
    dv_ref[:] = _from_bh(dv, bt, heads).astype(dv_ref.dtype)


def _nat_fwd_core(q, k, v, bias_b, seed_arr, scale, rate, bt):
    """Natural-layout core: q/k/v [B,L,H,D], bias_b [B,1,Lk] ->
    (out [B,Lq,H,D], mask [B,H,Lq,Lk])."""
    TRACE_COUNT[0] += 1
    b, lq, h, d = q.shape
    lk = k.shape[1]
    hd = h * d
    bt = _pick_tile_nat(b, bt, lq, lk, hd, h)
    out, mask = pl.pallas_call(
        functools.partial(_attn_dropout_fwd_kernel_nat_bh
                          if NAT_BATCHED_HEADS[0]
                          else _attn_dropout_fwd_kernel_nat, scale=scale,
                          rate=rate, heads=h),
        grid=(b // bt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _nat3_blk(bt, lq, hd), _nat3_blk(bt, lk, hd),
                  _nat3_blk(bt, lk, hd), _nat_bias_blk(bt, lk)],
        out_specs=[_nat3_blk(bt, lq, hd), _nat_mask_blk(bt, h, lq, lk)],
        out_shape=[jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
                   jax.ShapeDtypeStruct((b, h, lq, lk), jnp.bfloat16)],
        interpret=_interpret(),
    )(seed_arr, q.reshape(b, lq, hd), k.reshape(b, lk, hd),
      v.reshape(b, lk, hd), bias_b)
    return out.reshape(b, lq, h, d), mask


def _nat_bwd_core(q, k, v, bias_b, g, mask, scale, rate, bt):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    hd = h * d
    bt = _pick_tile_nat(b, bt, lq, lk, hd, h)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_dropout_bwd_kernel_nat_bh
                          if NAT_BATCHED_HEADS[0]
                          else _attn_dropout_bwd_kernel_nat, scale=scale,
                          rate=rate, heads=h),
        grid=(b // bt,),
        in_specs=[_nat3_blk(bt, lq, hd), _nat3_blk(bt, lk, hd),
                  _nat3_blk(bt, lk, hd), _nat_bias_blk(bt, lk),
                  _nat3_blk(bt, lq, hd), _nat_mask_blk(bt, h, lq, lk)],
        out_specs=[_nat3_blk(bt, lq, hd), _nat3_blk(bt, lk, hd),
                   _nat3_blk(bt, lk, hd)],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
            jax.ShapeDtypeStruct((b, lk, hd), k.dtype),
            jax.ShapeDtypeStruct((b, lk, hd), v.dtype),
        ],
        interpret=_interpret(),
    )(q.reshape(b, lq, hd), k.reshape(b, lk, hd), v.reshape(b, lk, hd),
      bias_b, g.reshape(b, lq, hd), mask)
    return (dq.reshape(b, lq, h, d), dk.reshape(b, lk, h, d),
            dv.reshape(b, lk, h, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _pallas_dropout_attention_nat(q, k, v, bias, seed_arr, scale, rate, bt):
    out, _ = _nat_fwd_core(q, k, v, _bias_bcast(bias, q.shape[0],
                                                k.shape[1]),
                           seed_arr, scale, rate, bt)
    return out


def _nat_fwd_rule(q, k, v, bias, seed_arr, scale, rate, bt):
    out, mask = _nat_fwd_core(q, k, v, _bias_bcast(bias, q.shape[0],
                                                   k.shape[1]),
                              seed_arr, scale, rate, bt)
    return out, (q, k, v, bias, mask)


def _nat_bwd_rule(scale, rate, bt, res, g):
    import numpy as _np

    q, k, v, bias, mask = res
    dq, dk, dv = _nat_bwd_core(q, k, v, _bias_bcast(bias, q.shape[0],
                                                    k.shape[1]),
                               g, mask, scale, rate, bt)
    dseed = _np.zeros((1,), dtype=jax.dtypes.float0)
    return (dq, dk, dv, jnp.zeros_like(bias), dseed)


_pallas_dropout_attention_nat.defvjp(_nat_fwd_rule, _nat_bwd_rule)


def _attn_kernel_nat(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, heads):
    bias = bias_ref[:].astype(jnp.float32)
    q3, k3, v3 = q_ref[:], k_ref[:], v_ref[:]
    d = q3.shape[-1] // heads
    outs = []
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        probs = _probs_arr(q3[..., sl], k3[..., sl], bias, scale)
        out = jax.lax.dot_general(
            probs.astype(v3.dtype), v3[..., sl],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append(out.astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def _attn_bwd_kernel_nat(q_ref, k_ref, v_ref, bias_ref, g_ref,
                         dq_ref, dk_ref, dv_ref, db_ref, *, scale, heads):
    bias = bias_ref[:].astype(jnp.float32)
    q3, k3, v3, g3 = q_ref[:], k_ref[:], v_ref[:], g_ref[:]
    d = q3.shape[-1] // heads
    dqs, dks, dvs = [], [], []
    db_acc = None
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        dq, dk, dv, db = _attn_bwd_math(q3[..., sl], k3[..., sl],
                                        v3[..., sl], bias, g3[..., sl],
                                        scale)
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
        db_acc = db if db_acc is None else db_acc + db
    dq_ref[:] = jnp.concatenate(dqs, axis=-1)
    dk_ref[:] = jnp.concatenate(dks, axis=-1)
    dv_ref[:] = jnp.concatenate(dvs, axis=-1)
    db_ref[:] = db_acc.astype(jnp.float32)


def _attn_kernel_nat_bh(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale,
                        heads):
    bt, lk = q_ref.shape[0], k_ref.shape[1]
    qb = _to_bh(q_ref[:], heads)
    kb = _to_bh(k_ref[:], heads)
    vb = _to_bh(v_ref[:], heads)
    probs = _probs_arr(qb, kb, _bh_bias(bias_ref[:], bt, heads, lk), scale)
    out = jax.lax.dot_general(
        probs.astype(vb.dtype), vb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = _from_bh(out, bt, heads).astype(o_ref.dtype)


def _attn_bwd_kernel_nat_bh(q_ref, k_ref, v_ref, bias_ref, g_ref,
                            dq_ref, dk_ref, dv_ref, db_ref, *, scale,
                            heads):
    bt, lk = q_ref.shape[0], k_ref.shape[1]
    qb = _to_bh(q_ref[:], heads)
    kb = _to_bh(k_ref[:], heads)
    vb = _to_bh(v_ref[:], heads)
    gb = _to_bh(g_ref[:], heads)
    dq, dk, dv, db = _attn_bwd_math(
        qb, kb, vb, _bh_bias(bias_ref[:], bt, heads, lk), gb, scale)
    dq_ref[:] = _from_bh(dq, bt, heads).astype(dq_ref.dtype)
    dk_ref[:] = _from_bh(dk, bt, heads).astype(dk_ref.dtype)
    dv_ref[:] = _from_bh(dv, bt, heads).astype(dv_ref.dtype)
    # sum db over heads via row slices: reducing over the major axis of a
    # reshaped [heads, bt, lk] hits a Mosaic relayout bug (invalid
    # replicated-dim relayout on the reduce), slice+add lowers cleanly
    acc = jax.lax.slice_in_dim(db, 0, bt, 1, axis=0)
    for hh in range(1, heads):
        acc = acc + jax.lax.slice_in_dim(db, hh * bt, (hh + 1) * bt, 1,
                                         axis=0)
    db_ref[:] = acc.astype(jnp.float32)


def _nat_eval_forward(q, k, v, bias, scale, bt):
    TRACE_COUNT[0] += 1
    b, lq, h, d = q.shape
    lk = k.shape[1]
    hd = h * d
    bt = _pick_tile_nat(b, bt, lq, lk, hd, h)
    out = pl.pallas_call(
        functools.partial(_attn_kernel_nat_bh if NAT_BATCHED_HEADS[0]
                          else _attn_kernel_nat, scale=scale, heads=h),
        grid=(b // bt,),
        in_specs=[_nat3_blk(bt, lq, hd), _nat3_blk(bt, lk, hd),
                  _nat3_blk(bt, lk, hd), _nat_bias_blk(bt, lk)],
        out_specs=_nat3_blk(bt, lq, hd),
        out_shape=jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq * lk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=b * h * lq * lk),
        interpret=_interpret(),
    )(q.reshape(b, lq, hd), k.reshape(b, lk, hd), v.reshape(b, lk, hd),
      _bias_bcast(bias, b, lk))
    return out.reshape(b, lq, h, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_fused_attention_nat(q, k, v, bias, scale):
    """Natural-layout no-dropout attention: q/k/v and all cotangents stay
    [B,L,H,D] (no layout ops around the kernels in either direction)."""
    return _nat_eval_forward(q, k, v, bias, scale, 16)


def _nat_eval_fwd_rule(q, k, v, bias, scale):
    return pallas_fused_attention_nat(q, k, v, bias, scale), (q, k, v, bias)


def _nat_eval_bwd_rule(scale, res, g):
    q, k, v, bias = res
    if not (kernels_enabled() and bias is not None and q.shape[1] >= 8):
        return _attn_bwd(scale, res, g)
    b, lq, h, d = q.shape
    lk = k.shape[1]
    hd = h * d
    bt = _pick_tile_nat(b, 16, lq, lk, hd, h)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_attn_bwd_kernel_nat_bh if NAT_BATCHED_HEADS[0]
                          else _attn_bwd_kernel_nat, scale=scale, heads=h),
        grid=(b // bt,),
        in_specs=[_nat3_blk(bt, lq, hd), _nat3_blk(bt, lk, hd),
                  _nat3_blk(bt, lk, hd), _nat_bias_blk(bt, lk),
                  _nat3_blk(bt, lq, hd)],
        out_specs=[_nat3_blk(bt, lq, hd), _nat3_blk(bt, lk, hd),
                   _nat3_blk(bt, lk, hd),
                   pl.BlockSpec((bt, lk), lambda bi: (bi, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
            jax.ShapeDtypeStruct((b, lk, hd), k.dtype),
            jax.ShapeDtypeStruct((b, lk, hd), v.dtype),
            jax.ShapeDtypeStruct((b, lk), jnp.float32),
        ],
        interpret=_interpret(),
    )(q.reshape(b, lq, hd), k.reshape(b, lk, hd), v.reshape(b, lk, hd),
      _bias_bcast(bias, b, lk), g.reshape(b, lq, hd))
    dbias = db[:, None, None, :]
    return (dq.reshape(b, lq, h, d), dk.reshape(b, lk, h, d),
            dv.reshape(b, lk, h, d), dbias.astype(bias.dtype))


pallas_fused_attention_nat.defvjp(_nat_eval_fwd_rule, _nat_eval_bwd_rule)


# ------------------------------------------------- hidden-mask piggyback
def pallas_dropout_attention_hm(q, k, v, bias, scale, rate, hidden_rate,
                                seed, batch_tile: int = 16):
    """Dropout attention that also returns two hidden-dropout keep masks.

    Returns ``(out, hm0, hm1)`` with ``out`` as pallas_dropout_attention and
    ``hm*`` bf16 0/1 masks of shape [B, Lq, H*D] — drawn from the kernel's
    per-program PRNG so the two hidden dropouts of the attn+FFN sublayer
    pair cost no separate XLA RNG pass. The masks are stop_gradient'ed:
    consumers multiply by them, and the corresponding cotangents entering
    the custom VJP are symbolic zeros that XLA eliminates.
    """
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    bt = _pick_tile(q.shape[0], batch_tile, q.shape[1], k.shape[1],
                    q.shape[3])
    out, hm0, hm1 = _pallas_dropout_attention_hm(
        q, k, v, bias, seed_arr, scale, rate, hidden_rate, bt)
    b, lq, h, d = q.shape
    re = lambda m: jnp.transpose(m, (1, 2, 0, 3)).reshape(b, lq, h * d)
    sg = jax.lax.stop_gradient
    return out, sg(re(hm0)), sg(re(hm1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _pallas_dropout_attention_hm(q, k, v, bias, seed_arr, scale, rate,
                                 hidden_rate, bt):
    out, _, hm0, hm1 = _dropout_hm_fwd_impl(q, k, v, bias, seed_arr, scale,
                                            rate, hidden_rate, bt)
    return out, hm0, hm1


def _dropout_hm_fwd_impl(q, k, v, bias, seed_arr, scale, rate, hidden_rate,
                         bt):
    TRACE_COUNT[0] += 1
    b, lq, h, d = q.shape
    lk = k.shape[1]
    qh, kh, vh = _head_major(q), _head_major(k), _head_major(v)
    bias_b = jnp.broadcast_to(bias.astype(jnp.float32),
                              (b, 1, 1, lk)).reshape(b, 1, lk)
    blk = _blk(bt, d)
    out, mask, hm0, hm1 = pl.pallas_call(
        functools.partial(_attn_dropout_fwd_hm_kernel, scale=scale,
                          rate=rate, hidden_rate=hidden_rate),
        grid=(h, b // bt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk(lq), blk(lk), blk(lk), _bias_blk(bt, lk)],
        out_specs=[blk(lq), _mask_blk(bt, lq, lk), blk(lq), blk(lq)],
        out_shape=[jax.ShapeDtypeStruct((h, b, lq, d), q.dtype),
                   jax.ShapeDtypeStruct((h, b, lq, lk), jnp.bfloat16),
                   jax.ShapeDtypeStruct((h, b, lq, d), jnp.bfloat16),
                   jax.ShapeDtypeStruct((h, b, lq, d), jnp.bfloat16)],
        interpret=_interpret(),
    )(seed_arr, qh, kh, vh, bias_b)
    return jnp.transpose(out, (1, 2, 0, 3)), mask, hm0, hm1


def _dropout_hm_fwd_rule(q, k, v, bias, seed_arr, scale, rate, hidden_rate,
                         bt):
    out, mask, hm0, hm1 = _dropout_hm_fwd_impl(q, k, v, bias, seed_arr,
                                               scale, rate, hidden_rate, bt)
    return (out, hm0, hm1), (q, k, v, bias, mask)


def _dropout_hm_bwd_rule(scale, rate, hidden_rate, bt, res, g):
    # the hm cotangents are zeros (masks are stop_gradient'ed downstream);
    # the attention VJP is identical to the mask-free kernel's
    g_out, _, _ = g
    return _dropout_bwd_rule(scale, rate, bt, res, g_out)


_pallas_dropout_attention_hm.defvjp(_dropout_hm_fwd_rule,
                                    _dropout_hm_bwd_rule)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    # blocks: q [1, bb, Lq, D], k/v [1, bb, Lk, D], bias [bb, 1, Lk] (one head)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [bb, Lq, Lk]
    scores = scores * scale + bias_ref[:].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [bb, Lq, D]
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_fused_attention(q, k, v, bias, scale):
    """q [B,Lq,H,D], k/v [B,Lk,H,D], bias [B,1,1,Lk] -> [B,Lq,H,D].

    Forward runs the Pallas kernel; backward recomputes the standard
    attention VJP with XLA ops (cheap at these lengths, keeps the kernel
    forward-only)."""
    return _pallas_forward(q, k, v, bias, scale)


def _attn_fwd(q, k, v, bias, scale):
    return _pallas_forward(q, k, v, bias, scale), (q, k, v, bias)


def _attn_bwd_math(q, k, v, bias, g, scale):
    """No-dropout attention VJP entirely in VMEM: probs recomputed from
    q/k/bias, all four cotangents emitted (dbias as per-head partial sums,
    reduced over heads in XLA). Closes the measured ~13% penalty the XLA
    recompute backward paid on dropout-free training configs."""
    probs = _probs_arr(q, k, bias, scale)
    g = g.astype(jnp.float32)
    v = v.astype(jnp.float32)
    dv = jax.lax.dot_general(probs, g, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    k = k.astype(jnp.float32)
    q = q.astype(jnp.float32)
    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    db = jnp.sum(ds, axis=1)
    return dq, dk, dv, db


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, db_ref, *, scale):
    dq, dk, dv, db = _attn_bwd_math(q_ref[0], k_ref[0], v_ref[0],
                                    bias_ref[:], g_ref[0], scale)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    db_ref[0] = db.astype(jnp.float32)


def _attn_bwd_pallas(q, k, v, bias, g, scale):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    bt = _pick_tile(b, 16, lq, lk, d)
    qh, kh, vh, gh = (_head_major(x) for x in (q, k, v, g))
    bias_b = jnp.broadcast_to(bias.astype(jnp.float32),
                              (b, 1, 1, lk)).reshape(b, 1, lk)
    blk = _blk(bt, d)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=(h, b // bt),
        in_specs=[blk(lq), blk(lk), blk(lk), _bias_blk(bt, lk), blk(lq)],
        out_specs=[blk(lq), blk(lk), blk(lk),
                   pl.BlockSpec((1, bt, lk), lambda hi, bi: (hi, bi, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((h, b, lq, d), q.dtype),
            jax.ShapeDtypeStruct((h, b, lk, d), k.dtype),
            jax.ShapeDtypeStruct((h, b, lk, d), v.dtype),
            jax.ShapeDtypeStruct((h, b, lk), jnp.float32),
        ],
        interpret=_interpret(),
    )(qh, kh, vh, bias_b, gh)
    back = lambda x: jnp.transpose(x, (1, 2, 0, 3))
    dbias = jnp.sum(db, axis=0)[:, None, None, :]
    return (back(dq), back(dk), back(dv), dbias.astype(bias.dtype))


def _attn_bwd(scale, res, g):
    q, k, v, bias = res
    if kernels_enabled() and bias is not None and q.shape[1] >= 8:
        return _attn_bwd_pallas(q, k, v, bias, g, scale)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
    scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", probs, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf) * scale
    # bias is [B,1,1,Lk]: reduce heads and query positions
    dbias = jnp.sum(ds, axis=(1, 2))[:, None, None, :]
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype))


pallas_fused_attention.defvjp(_attn_fwd, _attn_bwd)


def _pallas_forward(q, k, v, bias, scale, *, batch_tile: int = 16):
    TRACE_COUNT[0] += 1
    b, lq, h, d = q.shape
    lk = k.shape[1]
    if b % batch_tile != 0:
        batch_tile = 1 if b % 8 else 8
        if b % batch_tile:
            raise NotImplementedError("odd batch for pallas attention")
    # head-major layout for per-head grid walks
    qh = jnp.transpose(q, (2, 0, 1, 3))  # [H, B, Lq, D]
    kh = jnp.transpose(k, (2, 0, 1, 3))
    vh = jnp.transpose(v, (2, 0, 1, 3))
    bias_b = jnp.broadcast_to(bias.astype(jnp.float32), (b, 1, 1, lk))
    bias_b = bias_b.reshape(b, 1, lk)

    grid = (h, b // batch_tile)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, batch_tile, lq, d), lambda hi, bi: (hi, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch_tile, lk, d), lambda hi, bi: (hi, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch_tile, lk, d), lambda hi, bi: (hi, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, 1, lk), lambda hi, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, batch_tile, lq, d), lambda hi, bi: (hi, bi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, b, lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq * lk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
        interpret=_interpret(),
    )(qh, kh, vh, bias_b)
    return jnp.transpose(out, (1, 2, 0, 3))  # back to [B, Lq, H, D]
