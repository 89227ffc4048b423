#!/usr/bin/env python
"""Microbenchmark: fused dropout+residual+LN kernel vs XLA composition.

Isolates the kernel from its model integration (shard_map wrapper +
per-call seed derivation) at the exact train-step shapes ([b*l, 768]
bf16, rate 0.1), fwd-only and fwd+bwd, to attribute the A/B non-win
measured in tools/perf_probe.py.

Usage (single TPU process): python tools/microbench_resln.py [--iters 50]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters):
    import numpy as np

    r = fn()
    float(np.asarray(jax_leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(np.asarray(jax_leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def jax_leaves(x):
    import jax

    return jax.tree_util.tree_leaves(x)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--rows", type=int, default=5888)  # 256 * 23
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--rate", type=float, default=0.1)
    p.add_argument("--calls", type=int, default=24,
                   help="chained calls per program (~sublayer count)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_default_prng_impl", "rbg")
    from volta_tpu.ops import fused_residual as fr

    n, d = args.rows, args.dim
    rng = np.random.RandomState(0)
    o = jnp.asarray(rng.randn(n, d), jnp.bfloat16)
    x = jnp.asarray(rng.randn(n, d), jnp.bfloat16)
    scale = jnp.ones((d,), jnp.float32)
    bias = jnp.zeros((d,), jnp.float32)
    key = jax.random.PRNGKey(1)

    def xla_chain(o, x, key):
        y = x
        for i in range(args.calls):
            k = jax.random.fold_in(key, i)
            keep = jax.random.bernoulli(k, 1.0 - args.rate, o.shape)
            od = jnp.where(keep, o / (1.0 - args.rate),
                           jnp.zeros((), o.dtype))
            s = (od + y).astype(jnp.float32)
            mu = s.mean(-1, keepdims=True)
            var = ((s - mu) ** 2).mean(-1, keepdims=True)
            y = (((s - mu) * jax.lax.rsqrt(var + 1e-12)) * scale
                 + bias).astype(o.dtype)
        return y

    def kernel_chain(o, x, seed, bwd="pallas"):
        y = x
        for i in range(args.calls):
            y = fr.dropout_residual_ln(o, y, scale, bias, seed + i,
                                       args.rate,
                                       bwd_impl=bwd).astype(o.dtype)
        return y

    results = {}
    f_x = jax.jit(lambda: xla_chain(o, x, key))
    results["xla_fwd_ms"] = timeit(f_x, args.iters)
    f_k = jax.jit(lambda: kernel_chain(o, x, 7))
    results["kernel_fwd_ms"] = timeit(f_k, args.iters)

    def g_x():
        return jax.grad(lambda o_: jnp.sum(
            xla_chain(o_, x, key).astype(jnp.float32)))(o)

    def g_k():
        return jax.grad(lambda o_: jnp.sum(
            kernel_chain(o_, x, 7).astype(jnp.float32)))(o)

    def g_h():
        return jax.grad(lambda o_: jnp.sum(
            kernel_chain(o_, x, 7, bwd="xla").astype(jnp.float32)))(o)

    results["xla_fwdbwd_ms"] = timeit(jax.jit(g_x), args.iters)
    results["kernel_fwdbwd_ms"] = timeit(jax.jit(g_k), args.iters)
    results["hybrid_fwdbwd_ms"] = timeit(jax.jit(g_h), args.iters)
    print(json.dumps({k: round(v, 3) for k, v in results.items()}),
          flush=True)


if __name__ == "__main__":
    main()
