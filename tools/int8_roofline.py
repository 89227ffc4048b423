#!/usr/bin/env python
"""int8 matmul roofline probe at the serving step's shapes.

v5e quotes ~394 TOPS int8 vs 197 TFLOP/s bf16. The serving forward is
compute-bound at ~59% of bf16 peak, so an int8 path could up-to-double
it — IF XLA lowers int8 dot_general to the MXU's int8 mode at these
shapes. This probe measures, at the model's [tokens,768]x[768,768] and
FFN shapes:

  1. bf16 chain (control — the number matmul_roofline.py reports)
  2. pure int8 chain, int32 accumulation (upper bound: weights AND
     activations already int8, requant between calls excluded)
  3. dynamic-quant chain: per-token activation quantisation f32->int8 +
     int8 dot + rescale, the epilogues a real serving path would pay
  4. weight-only chain: int8 weights dequantised to bf16 inside the
     matmul (bandwidth saving only; compute identical to bf16)

Decision rule: build the int8 serving export only if (3) beats (1)
materially; otherwise record the numbers and close the chapter.

Usage (single TPU process): python tools/int8_roofline.py [--iters 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197.0
PEAK_INT8 = 394.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--tokens", type=int, default=15360)
    p.add_argument("--hidden", type=int, default=768)
    p.add_argument("--ffn", type=int, default=3072)
    p.add_argument("--calls", type=int, default=24)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    n, h, f, calls = args.tokens, args.hidden, args.ffn, args.calls
    rng = np.random.RandomState(0)
    dn = (((1,), (0,)), ((), ()))  # standard [m,k]x[k,n]

    xb = jax.device_put(jnp.asarray(rng.randn(n, h) * 0.05, jnp.bfloat16))
    wb = [jax.device_put(jnp.asarray(rng.randn(h, h) * 0.05, jnp.bfloat16))
          for _ in range(4)]
    xi = jax.device_put(jnp.asarray(
        rng.randint(-127, 128, (n, h)), jnp.int8))
    wi = [jax.device_put(jnp.asarray(
        rng.randint(-127, 128, (h, h)), jnp.int8)) for _ in range(4)]
    wscale = [jax.device_put(jnp.asarray(
        np.abs(rng.randn(h)) * 0.01 + 1e-3, jnp.float32)) for _ in range(4)]

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

    warm = jax.jit(lambda a, w: a @ w)
    timeit(warm, (xb, wb[0]), 4)

    results = {}
    ops = 2.0 * n * h * h * calls

    def record(name, ms, peak):
        t = ops / (ms * 1e-3) / 1e12
        results[name] = {"ms": round(ms, 3), "tops": round(t, 1),
                         "peak_pct": round(100 * t / peak, 1)}
        print(json.dumps({name: results[name]}), flush=True)

    # 1. bf16 control
    @jax.jit
    def bf16_chain(x, *ws):
        y = x
        for i in range(calls):
            y = y @ ws[i % len(ws)]
        return y

    record("bf16_chain", timeit(bf16_chain, (xb, *wb), args.iters),
           PEAK_BF16)

    # 2. pure int8, int32 accum; clip+renarrow between calls so every
    # dot is int8xint8 (the renarrow models the requant's shift cost
    # without the scale math)
    @jax.jit
    def int8_chain(x, *ws):
        y = x
        for i in range(calls):
            acc = lax.dot_general(y, ws[i % len(ws)], dn,
                                  preferred_element_type=jnp.int32)
            y = lax.clamp(-127, acc >> 8, 127).astype(jnp.int8)
        return y

    record("int8_chain_requant_shift",
           timeit(int8_chain, (xi, *wi), args.iters), PEAK_INT8)

    # 3. dynamic per-token quantisation: bf16 activations in, quantise,
    # int8 dot, rescale by (act_scale x w_scale) back to bf16 — the
    # true serving epilogue cost
    @jax.jit
    def dynq_chain(x, ws, wss):
        y = x
        for i in range(calls):
            a = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
            s = (a / 127.0).astype(jnp.float32) + 1e-8
            q = jnp.round(y.astype(jnp.float32) / s).astype(jnp.int8)
            acc = lax.dot_general(q, ws[i % len(ws)], dn,
                                  preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * s * wss[i % len(wss)]
                 ).astype(jnp.bfloat16)
        return y

    record("int8_dynamic_quant_chain",
           timeit(dynq_chain, (xb, tuple(wi), tuple(wscale)), args.iters),
           PEAK_INT8)

    # 4. weight-only: int8 weights dequantised per-channel to bf16
    @jax.jit
    def wonly_chain(x, ws, wss):
        y = x
        for i in range(calls):
            w = (ws[i % len(ws)].astype(jnp.float32)
                 * wss[i % len(wss)]).astype(jnp.bfloat16)
            y = y @ w
        return y

    record("int8_weight_only_chain",
           timeit(wonly_chain, (xb, tuple(wi), tuple(wscale)), args.iters),
           PEAK_BF16)

    print(json.dumps({"shapes": {"tokens": n, "hidden": h, "calls": calls},
                      "results": results}))


if __name__ == "__main__":
    main()
