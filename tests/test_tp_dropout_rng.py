"""Off-device evidence for the TP dropout seed derivation.

The in-kernel-dropout attention kernels seed the Mosaic hardware PRNG with
``seed + program_id(0)*7919 + program_id(1)*104729`` (head-major,
ops/pallas_attention.py:_mix_seed) or ``seed + program_id(0)*104729``
(natural layout, :426/:508), and the TP wrapper adds per-device offsets
``axis_index('data')*100003 + axis_index('model')*393241``
(parallel/tp.py:shard_dropout_attention). The Mosaic PRNG itself cannot be
simulated on CPU (the interpreter returns all-zero bits), so this file
proves the two properties that ARE pure arithmetic:

1. *Disjointness*: over every realistic (device, program) grid the mixed
   32-bit seeds are pairwise distinct (incl. int32 wraparound), so no two
   kernel programs ever share a PRNG stream;
2. *Whiteness given distinct seeds*: Bernoulli masks drawn from streams
   keyed by stride-offset seeds agree at the iid rate — i.e. the stride
   structure itself introduces no correlation for any seeded
   full-avalanche generator (threefry here; the on-TPU A/B for the Mosaic
   generator is tools/validate_tpu.py check 2c).
"""

import numpy as np

import jax
import jax.numpy as jnp

DATA_STRIDE = 100003
MODEL_STRIDE = 393241
HI_STRIDE = 7919
BI_STRIDE = 104729


def _mixed_seeds(base, nd, nm, nh, nb):
    """All (data, model, program0, program1) mixed seeds, with the int32
    wraparound the kernel arithmetic performs, as uint32."""
    d = np.arange(nd, dtype=np.int64).reshape(-1, 1, 1, 1) * DATA_STRIDE
    m = np.arange(nm, dtype=np.int64).reshape(1, -1, 1, 1) * MODEL_STRIDE
    h = np.arange(nh, dtype=np.int64).reshape(1, 1, -1, 1) * HI_STRIDE
    b = np.arange(nb, dtype=np.int64).reshape(1, 1, 1, -1) * BI_STRIDE
    return ((base + d + m + h + b) % (1 << 32)).astype(np.uint64)


def test_seed_disjointness_headmajor_grid():
    """Head-major kernel grid (programs = heads x batch-tiles) under the
    largest production mesh shapes: all streams distinct."""
    for base in (0, 12345, 2**31 - 1, 2**31 - 104729):
        seeds = _mixed_seeds(base, nd=8, nm=2, nh=16, nb=64)
        flat = seeds.ravel()
        assert np.unique(flat).size == flat.size, base


def test_seed_disjointness_natural_grid():
    """Natural-layout kernels grid over batch tiles only (program_id(0) *
    104729); scan a pod-scale device space."""
    for base in (7, 2**31 - 1):
        seeds = _mixed_seeds(base, nd=64, nm=4, nh=1, nb=256)
        flat = seeds.ravel()
        assert np.unique(flat).size == flat.size, base


def test_seed_disjointness_across_large_dp():
    """Data-parallel-only pods (how the framework actually scales): 256
    replicas x 512 batch tiles."""
    seeds = _mixed_seeds(99, nd=256, nm=1, nh=1, nb=512)
    flat = seeds.ravel()
    assert np.unique(flat).size == flat.size


def test_stride_offset_masks_are_iid_white():
    """Masks from seed and seed+stride (any production stride) agree at
    the iid Bernoulli rate for a full-avalanche generator — the stride
    pattern carries no structure a seeded PRNG preserves."""
    rate = 0.1
    shape = (64, 4096)
    base = 20260820

    def mask(seed):
        bits = jax.random.bits(jax.random.PRNGKey(seed), shape, jnp.uint32)
        return np.asarray(bits < np.uint32((1 - rate) * 4294967295.0))

    m0 = mask(base)
    n = m0.size
    keep = m0.mean()
    assert abs(keep - (1 - rate)) < 0.01
    for stride in (DATA_STRIDE, MODEL_STRIDE, HI_STRIDE, BI_STRIDE):
        for k in (1, 3):
            m1 = mask((base + k * stride) % (1 << 32))
            agree = (m0 == m1).mean()
            iid = keep * keep + (1 - keep) * (1 - keep)
            # binomial std at n=256k is ~8e-4; 5 sigma
            assert abs(agree - iid) < 5e-3, (stride, k, agree, iid)


def test_device_offsets_change_the_stream_not_the_rate():
    """The exact shard_dropout_attention offsets: every device in a
    data=4 x model=2 mesh draws a distinct mask set at the same keep
    rate."""
    rate = 0.4
    shape = (32, 1024)
    base = 555

    def mask(seed):
        bits = jax.random.bits(jax.random.PRNGKey(seed), shape, jnp.uint32)
        return np.asarray(bits < np.uint32((1 - rate) * 4294967295.0))

    masks = {}
    for d in range(4):
        for m in range(2):
            masks[(d, m)] = mask(base + d * DATA_STRIDE + m * MODEL_STRIDE)
    keys = list(masks)
    for i, a in enumerate(keys):
        assert abs(masks[a].mean() - (1 - rate)) < 0.02, a
        for b in keys[i + 1:]:
            assert not np.array_equal(masks[a], masks[b]), (a, b)
