#!/usr/bin/env python
"""Decision probe: can anything beat XLA's weight-gradient matmul at the
step's wgrad shapes?

`tools/matmul_roofline.py` measured the wgrad family ([h,n]x[n,f],
token-axis contraction with a huge K=15360 reduce dim and a small
[768,3072] output) at **64.3% MXU** — the weakest matmul family in the
step and ~1/4 of its FLOPs. Variants:

  xla_T         sum of g.T @ a            (what autodiff emits today)
  xla_dg        dot_general contracting the token axis directly (no
                materialized transpose)
  xla_dg_f32    same, f32 accumulate-output (skips the bf16 down-cast
                between the per-layer partial sums)
  pallas_k      K-gridded Pallas kernel: [h,BK]x[BK,f] tiles accumulated
                into a VMEM-resident f32 [h,f] output across grid steps

If nothing beats xla_T by >5%, the 64.3% is the hardware/compiler
roofline for this contraction and the MFU ceiling note stands as final.

Usage (single TPU process): python tools/wgrad_probe.py [--iters 30]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197.0


def _wgrad_kernel(g_ref, a_ref, o_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += jax.lax.dot_general(
        g_ref[...], a_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def make_pallas_wgrad(n, h, f, bk):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    return pl.pallas_call(
        _wgrad_kernel,
        grid=(n // bk,),
        in_specs=[
            pl.BlockSpec((bk, h), lambda k: (k, 0)),
            pl.BlockSpec((bk, f), lambda k: (k, 0)),
        ],
        out_specs=pl.BlockSpec((h, f), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, f), jnp.float32),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--tokens", type=int, default=15360)
    p.add_argument("--hidden", type=int, default=768)
    p.add_argument("--ffn", type=int, default=3072)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--bk", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n, h, f, L = args.tokens, args.hidden, args.ffn, args.layers
    rng = np.random.RandomState(0)

    def dev(*shape):
        return jax.device_put(
            jnp.asarray(rng.randn(*shape) * 0.05, jnp.bfloat16))

    gys = [dev(n, h) for _ in range(L)]
    acts = [dev(n, f) for _ in range(L)]
    flops = 2 * n * h * f * L

    warm = jax.jit(lambda a: (a @ a[:h].T).sum())
    float(warm(gys[0][:h]))

    def timeit(fn, fargs):
        r = fn(*fargs)
        float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
              .astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(*fargs)
        float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
              .astype(jnp.float32))
        return (time.perf_counter() - t0) / args.iters * 1000

    results = {}

    def record(name, ms):
        tf = flops / (ms * 1e-3) / 1e12
        results[name] = round(tf, 1)
        print(json.dumps({"variant": name, "ms": round(ms, 2),
                          "tflops": round(tf, 1),
                          "mxu_pct": round(100 * tf / PEAK_TFLOPS, 1)}),
              flush=True)

    @jax.jit
    def xla_T(gy_list, act_list):
        return sum((g.T @ a).astype(jnp.float32)
                   for g, a in zip(gy_list, act_list))

    record("xla_T", timeit(xla_T, (gys, acts)))

    @jax.jit
    def xla_dg(gy_list, act_list):
        return sum(jax.lax.dot_general(
            g, a, (((0,), (0,)), ((), ()))).astype(jnp.float32)
            for g, a in zip(gy_list, act_list))

    record("xla_dg", timeit(xla_dg, (gys, acts)))

    @jax.jit
    def xla_dg_f32(gy_list, act_list):
        return sum(jax.lax.dot_general(
            g, a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            for g, a in zip(gy_list, act_list))

    record("xla_dg_f32", timeit(xla_dg_f32, (gys, acts)))

    try:
        mm = make_pallas_wgrad(n, h, f, args.bk)

        @jax.jit
        def pallas_k(gy_list, act_list):
            return sum(mm(g, a) for g, a in zip(gy_list, act_list))

        record("pallas_k", timeit(pallas_k, (gys, acts)))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": "pallas_k",
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)

    best = max(results, key=results.get)
    print(json.dumps({"verdict": best, "gain_vs_xla_T_pct": round(
        100 * (results[best] / results["xla_T"] - 1), 1)}))


if __name__ == "__main__":
    main()
