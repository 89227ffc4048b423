#!/usr/bin/env python
"""Pure-matmul roofline probe at the headline step's exact shapes.

The round-3 trace decomposition attributes 48.2 ms of the 72 ms VQA step
to XLA matmul fusions running at ~75% MXU efficiency (trace FLOPs /
fusion time). That 75% conflates the matmuls with the elementwise
epilogues XLA fused into them. This probe times bare chained matmuls at
the step's shapes (b256 x L60 tokens, h768, ffn 3072, bf16) plus
bias+gelu-epilogue variants, so the gap decomposes into
"what the MXU gives an undisturbed matmul at these shapes" vs
"what the epilogues cost".

Platform rules (CLAUDE.md): inputs are device_put and passed as jit ARGS
(closure constants re-upload per call here); an untimed warmup program
eats the multi-second first-program penalty; sync via float(), not
block_until_ready.

Usage (single TPU process): python tools/matmul_roofline.py [--iters 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--tokens", type=int, default=15360)  # 256 * (23+37)
    p.add_argument("--hidden", type=int, default=768)
    p.add_argument("--ffn", type=int, default=3072)
    p.add_argument("--calls", type=int, default=24)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n, h, f, calls = args.tokens, args.hidden, args.ffn, args.calls
    rng = np.random.RandomState(0)

    def dev(*shape):
        return jax.device_put(
            jnp.asarray(rng.randn(*shape) * 0.05, jnp.bfloat16))

    x = dev(n, h)
    w_sq = [dev(h, h) for _ in range(4)]
    w_up = dev(h, f)
    w_dn = dev(f, h)
    b_up = jax.device_put(jnp.zeros((f,), jnp.bfloat16))
    b_dn = jax.device_put(jnp.zeros((h,), jnp.bfloat16))
    acts = [dev(n, f) for _ in range(6)]
    gys = [dev(n, h) for _ in range(6)]

    def timeit(fn, fargs, iters):
        r = fn(*fargs)
        float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
              .astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*fargs)
        float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
              .astype(jnp.float32))
        return (time.perf_counter() - t0) / iters * 1000

    # warmup program: eats the first-timed-program penalty (16s/call class)
    warm = jax.jit(lambda a, w: a @ w)
    timeit(warm, (x, w_sq[0]), 4)

    results = {}

    def record(name, ms, flops):
        tf = flops / (ms * 1e-3) / 1e12
        results[name] = {"ms": round(ms, 3), "tflops": round(tf, 1),
                         "mxu_pct": round(100 * tf / PEAK_TFLOPS, 1)}

    # 1. chained square projections: the q/k/v/o shape, sequential like
    # the layer stack (each consumes the previous output)
    @jax.jit
    def proj_chain(x, *ws):
        y = x
        for i in range(calls):
            y = y @ ws[i % len(ws)]
        return y

    ms = timeit(proj_chain, (x, *w_sq), args.iters)
    record("proj_768x768_chain", ms, 2 * n * h * h * calls)

    # 2. chained FFN pairs, bare (no bias/activation)
    @jax.jit
    def ffn_chain(x, w1, w2):
        y = x
        for _ in range(calls // 2):
            y = (y @ w1) @ w2
        return y

    ms = timeit(ffn_chain, (x, w_up, w_dn), args.iters)
    record("ffn_pair_chain_bare", ms, 2 * n * h * f * 2 * (calls // 2))

    # 3. the same FFN pairs with the model's epilogues (bias+gelu up,
    # bias down) — the shape XLA actually fuses in the step
    @jax.jit
    def ffn_chain_epi(x, w1, w2, b1, b2):
        y = x
        for _ in range(calls // 2):
            y = jax.nn.gelu((y @ w1) + b1, approximate=False) @ w2 + b2
        return y

    ms = timeit(ffn_chain_epi, (x, w_up, w_dn, b_up, b_dn), args.iters)
    record("ffn_pair_chain_gelu", ms, 2 * n * h * f * 2 * (calls // 2))

    # 3b. tanh-approximation gelu epilogue (the original-BERT formulation)
    @jax.jit
    def ffn_chain_tanh(x, w1, w2, b1, b2):
        y = x
        for _ in range(calls // 2):
            y = jax.nn.gelu((y @ w1) + b1, approximate=True) @ w2 + b2
        return y

    ms = timeit(ffn_chain_tanh, (x, w_up, w_dn, b_up, b_dn), args.iters)
    record("ffn_pair_chain_gelu_tanh", ms, 2 * n * h * f * 2 * (calls // 2))

    # 3c. exact erf gelu evaluated in f32 (bf16 erf may lower worse than
    # an upcast-compute-downcast sandwich)
    @jax.jit
    def ffn_chain_erf32(x, w1, w2, b1, b2):
        y = x
        for _ in range(calls // 2):
            u = ((y @ w1) + b1).astype(jnp.float32)
            g = u * 0.5 * (1.0 + jax.lax.erf(u * (2.0 ** -0.5)))
            y = g.astype(jnp.bfloat16) @ w2 + b2
        return y

    ms = timeit(ffn_chain_erf32, (x, w_up, w_dn, b_up, b_dn), args.iters)
    record("ffn_pair_chain_gelu_erf32", ms, 2 * n * h * f * 2 * (calls // 2))

    # 3d. QKV shapes: three INDEPENDENT square matmuls over the same
    # input (how the model computes q/k/v today) vs one fused
    # [h, 3h] matmul (what a stored-fused QKV weight would run) —
    # chained over layers so it matches the step's dependency structure
    w3 = dev(h, 3 * h)

    @jax.jit
    def qkv_sep_chain(x, wq, wk, wv, wo):
        y = x
        for _ in range(calls // 2):
            q, kk, vv = y @ wq, y @ wk, y @ wv
            y = (q + kk + vv) @ wo  # stand-in combine + output proj
        return y

    ms = timeit(qkv_sep_chain, (x, *w_sq), args.iters)
    record("qkv_separate_chain", ms, 2 * n * h * h * 4 * (calls // 2))

    @jax.jit
    def qkv_fused_chain(x, w3, wo):
        y = x
        for _ in range(calls // 2):
            qkv = y @ w3
            q = jax.lax.slice_in_dim(qkv, 0, h, axis=1)
            kk = jax.lax.slice_in_dim(qkv, h, 2 * h, axis=1)
            vv = jax.lax.slice_in_dim(qkv, 2 * h, 3 * h, axis=1)
            y = (q + kk + vv) @ wo
        return y

    ms = timeit(qkv_fused_chain, (x, w3, w_sq[3]), args.iters)
    record("qkv_fused_chain", ms, 2 * n * h * h * 4 * (calls // 2))

    # 4. wgrad shape: [h, n] x [n, f] — token-contraction, the other
    # matmul family the backward runs; independent instances summed
    @jax.jit
    def wgrad(gy_list, act_list):
        return sum((g.T @ a).astype(jnp.float32)
                   for g, a in zip(gy_list, act_list))

    ms = timeit(wgrad, (gys, acts), args.iters)
    record("wgrad_768xN_x_Nx3072", ms, 2 * n * h * f * len(acts))

    # 5. dgrad shape: [n, f] x [f, h]
    @jax.jit
    def dgrad(act_list, w):
        y = jnp.zeros((n, h), jnp.bfloat16)
        for a in act_list:
            y = y + a @ w
        return y

    ms = timeit(dgrad, (acts, w_dn), args.iters)
    record("dgrad_Nx3072_x_3072x768", ms, 2 * n * h * f * len(acts))

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
