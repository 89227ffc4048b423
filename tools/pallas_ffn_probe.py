#!/usr/bin/env python
"""Decision probe: can a Pallas fused matmul+tanh-gelu FFN kernel beat
XLA's fused chain at the headline step's exact FFN shapes?

Round-3 context (BASELINE.md): the step trace shows matmul fusions at
~75% MXU; `tools/matmul_roofline.py` decomposed that into bare FFN
matmuls at 88% and the tanh-gelu epilogue chain at ~85%. The remaining
question (VERDICT r3 item 7) is whether hand-tiling the first FFN matmul
with its bias+tanh-gelu epilogue inside the kernel recovers those
points, or whether 85% IS the roofline for this shape mix. FFN matmuls
are ~2/3 of the step's FLOPs, so +5 MXU points here ≈ +3% headline.

Variants (all bf16 inputs/outputs, f32 accumulation, chained `calls`
times with data dependence so nothing is CSE'd or dead-code-eliminated):
  xla        gelu_tanh(x@W1+b1)@W2+b2 — what the step runs today
  pallas1    Pallas(matmul+bias+tanh-gelu) for the [n,h]x[h,f] leg,
             XLA for the [n,f]x[f,h] contraction
  pallas2    both legs Pallas (second = matmul+bias, no activation)

Platform rules (CLAUDE.md): operands device_put and passed as jit args,
untimed warmup program first, sync via float().

Usage (single TPU process): python tools/pallas_ffn_probe.py [--iters 20]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197.0  # v5e bf16


def gelu_tanh(x):
    import jax.numpy as jnp

    c = 0.7978845608028654  # sqrt(2/pi)
    x32 = x.astype(jnp.float32)
    return (0.5 * x32 * (1.0 + jnp.tanh(c * (x32 + 0.044715 * x32 ** 3))))


def _ffn1_kernel(x_ref, w_ref, b_ref, o_ref, *, act):
    import jax
    import jax.numpy as jnp

    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + b_ref[...].astype(jnp.float32)
    if act:
        acc = gelu_tanh(acc)
    o_ref[...] = acc.astype(o_ref.dtype)


def make_pallas_matmul(n, k, m, bm, bn, act):
    """[n,k] x [k,m] + bias (+ tanh-gelu) with full-K tiles on a
    (n/bm, m/bn) grid."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    return pl.pallas_call(
        functools.partial(_ffn1_kernel, act=act),
        grid=(n // bm, m // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.bfloat16),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--tokens", type=int, default=15360)  # 256 * (23+37)
    p.add_argument("--hidden", type=int, default=768)
    p.add_argument("--ffn", type=int, default=3072)
    p.add_argument("--calls", type=int, default=12)      # 12 FFN sublayers
    p.add_argument("--bm", type=int, default=512)
    p.add_argument("--bn", type=int, default=1024)
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
    w1, b1 = dev(h, f), dev(1, f)
    w2, b2 = dev(f, h), dev(1, h)

    flops = calls * 2 * 2 * n * h * f  # two matmuls per call

    def xla_ffn(x, w1, b1, w2, b2):
        y = gelu_tanh(jax.lax.dot_general(
            x, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) +
            b1.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jax.lax.dot_general(
            y, w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) +
            b2.astype(jnp.float32)).astype(jnp.bfloat16)

    mm1 = make_pallas_matmul(n, h, f, args.bm, args.bn, act=True)
    # second leg: K=ffn is the big axis; keep the tile inside ~12 MB VMEM
    mm2 = make_pallas_matmul(n, f, h, args.bm, min(args.bn, h), act=False)

    def pallas1_ffn(x, w1, b1, w2, b2):
        y = mm1(x, w1, b1)
        return (jax.lax.dot_general(
            y, w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) +
            b2.astype(jnp.float32)).astype(jnp.bfloat16)

    def pallas2_ffn(x, w1, b1, w2, b2):
        return mm2(mm1(x, w1, b1), w2, b2)

    def chain(step):
        def fn(x, w1, b1, w2, b2):
            for _ in range(calls):
                x = step(x, w1, b1, w2, b2)
            return x
        return jax.jit(fn)

    # warmup program eats the first-program penalty (CLAUDE.md)
    warm = jax.jit(lambda a: (a @ a[:args.hidden].T).sum())
    float(warm(x[: args.hidden]))

    results = {}
    for name, step in [("xla", xla_ffn), ("pallas1", pallas1_ffn),
                       ("pallas2", pallas2_ffn)]:
        fn = chain(step)
        try:
            float(fn(x, w1, b1, w2, b2).sum())  # compile + warm
            t0 = time.time()
            out = None
            for _ in range(args.iters):
                out = fn(x, w1, b1, w2, b2)
            float(out.sum())
            dt = (time.time() - t0) / args.iters
            tf = flops / dt / 1e12
            results[name] = tf
            print(json.dumps({
                "variant": name, "ms": round(dt * 1e3, 2),
                "tflops": round(tf, 1),
                "mxu_pct": round(100 * tf / PEAK_TFLOPS, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001 - report and move on
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:400]}),
                  flush=True)

    if "xla" in results and results:
        best = max(results, key=results.get)
        print(json.dumps({"verdict": best,
                          "gain_vs_xla_pct": round(
                              100 * (results[best] / results["xla"] - 1), 1)}))


if __name__ == "__main__":
    main()
