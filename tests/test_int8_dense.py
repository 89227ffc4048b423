"""int8 serving quantization: kernel numerics, model-level logit
agreement, and the quantized export artifact round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from volta_tpu import export as vexport
from volta_tpu.ops.int8_dense import (apply_quantized,
                                      calibrate_activation_scales,
                                      int8_dense_apply, quantize_kernel,
                                      quantize_variables)

from test_export import TASK_CFG, _batch, _tiny_cfg


def test_int8_dense_apply_matches_manual():
    rng = np.random.RandomState(0)
    x = rng.randn(5, 16).astype(np.float32)
    w = (rng.randn(16, 8) * 0.1).astype(np.float32)
    b = rng.randn(8).astype(np.float32)

    q, scale = quantize_kernel(w)
    got = np.asarray(int8_dense_apply(x, q, scale, b,
                                      out_dtype=jnp.float32))

    # manual reference: symmetric per-channel weights, per-row activations
    ws = np.abs(w).max(0) / 127.0 + 1e-12
    wq = np.clip(np.round(w / ws), -127, 127).astype(np.int64)
    xs = np.abs(x).max(-1, keepdims=True) / 127.0 + 1e-12
    xq = np.clip(np.round(x / xs), -127, 127).astype(np.int64)
    want = (xq @ wq).astype(np.float64) * (xs * ws) + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # int8 quantization error itself is bounded by the usual ~1% scale
    exact = x @ w + b
    denom = np.abs(exact).max() + 1e-6
    assert np.abs(got - exact).max() / denom < 0.05


def test_quantize_variables_prunes_dense_kernels():
    from volta_tpu.models import VoltaForVLTasks

    cfg = _tiny_cfg()
    batch = _batch(cfg)
    model = VoltaForVLTasks(cfg, TASK_CFG, ("TASK1",))
    variables = model.init(jax.random.PRNGKey(0), batch[0], batch[1],
                           batch[2], "TASK1", batch[3], batch[4], batch[5])
    bundle = quantize_variables(variables)

    assert bundle["int8"], "no dense layers found to quantize"
    # every quantized entry left an empty slot in params (pruned upload)
    leaves_fp = sum(x.size for x in jax.tree.leaves(variables["params"]))
    leaves_q = sum(x.size for x in jax.tree.leaves(bundle["params"]))
    assert leaves_q < leaves_fp
    for key, entry in bundle["int8"].items():
        assert entry["q"].dtype == jnp.int8
        assert entry["q"].ndim == 2
        assert entry["scale"].shape == (entry["q"].shape[1],)
    # the encoder's hot matmuls are all in the table
    joined = "\n".join(bundle["int8"])
    for frag in ("query", "key", "value", "inter_dense", "out_dense"):
        assert frag in joined


def test_apply_quantized_agrees_with_fp32():
    from volta_tpu.models import VoltaForVLTasks

    cfg = _tiny_cfg()
    batch = _batch(cfg)
    model = VoltaForVLTasks(cfg, TASK_CFG, ("TASK1",))
    variables = model.init(jax.random.PRNGKey(1), batch[0], batch[1],
                           batch[2], "TASK1", batch[3], batch[4], batch[5])
    fp, _ = model.apply(variables, batch[0], batch[1], batch[2], "TASK1",
                        batch[3], batch[4], batch[5])
    bundle = quantize_variables(variables)
    q8, _ = apply_quantized(model, bundle, batch[0], batch[1], batch[2],
                            "TASK1", batch[3], batch[4], batch[5])
    fp = np.asarray(fp, np.float32)
    q8 = np.asarray(q8, np.float32)
    # logits agree to quantization scale and rank the same answers
    assert np.abs(q8 - fp).max() < 0.15 * (np.abs(fp).max() + 1e-6)
    assert (q8.argmax(-1) == fp.argmax(-1)).mean() >= 0.75


def test_static_scale_matches_manual():
    rng = np.random.RandomState(3)
    x = rng.randn(5, 16).astype(np.float32)
    w = (rng.randn(16, 8) * 0.1).astype(np.float32)
    q, scale = quantize_kernel(w)
    a = float(np.abs(x).max() / 127.0 + 1e-12)
    got = np.asarray(int8_dense_apply(x, q, scale, None,
                                      out_dtype=jnp.float32, a_scale=a))
    ws = np.abs(w).max(0) / 127.0 + 1e-12
    wq = np.clip(np.round(w / ws), -127, 127).astype(np.int64)
    xq = np.clip(np.round(x / a), -127, 127).astype(np.int64)
    want = (xq @ wq).astype(np.float64) * (a * ws)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_static_calibration_and_agreement():
    """Calibrated static scales cover every exercised Dense and the static
    forward stays close to fp32 on a batch the calibration never saw."""
    from volta_tpu.models import VoltaForVLTasks

    cfg = _tiny_cfg()
    model = VoltaForVLTasks(cfg, TASK_CFG, ("TASK1",))
    cal = [_batch(cfg, seed=s) for s in (10, 11)]
    batch = _batch(cfg, seed=12)
    variables = model.init(jax.random.PRNGKey(1), *cal[0][:3], "TASK1",
                           *cal[0][3:])
    apply_fn = lambda v, *b: model.apply(v, b[0], b[1], b[2], "TASK1",
                                         b[3], b[4], b[5])
    scales = calibrate_activation_scales(apply_fn, variables, cal)
    assert scales and all(v > 0 for v in scales.values())

    bundle = quantize_variables(variables, act_scales=scales)
    # every exercised Dense got a static scale baked in
    assert all(e["a"] is not None for e in bundle["int8"].values())

    fp, _ = model.apply(variables, batch[0], batch[1], batch[2], "TASK1",
                        batch[3], batch[4], batch[5])
    q8, _ = apply_quantized(model, bundle, batch[0], batch[1], batch[2],
                            "TASK1", batch[3], batch[4], batch[5])
    fp = np.asarray(fp, np.float32)
    q8 = np.asarray(q8, np.float32)
    # static scales clip out-of-calibration outliers -> a bit looser than
    # the dynamic path, but still quantization-scale agreement
    assert np.abs(q8 - fp).max() < 0.25 * (np.abs(fp).max() + 1e-6)


def test_int8_static_export_roundtrip(tmp_path):
    from volta_tpu.models import VoltaForVLTasks

    cfg = _tiny_cfg()
    b, l, r = 4, 10, 7
    batch = _batch(cfg, b, l, r)
    model = VoltaForVLTasks(cfg, TASK_CFG, ("TASK1",))
    variables = model.init(jax.random.PRNGKey(0), batch[0], batch[1],
                           batch[2], "TASK1", batch[3], batch[4], batch[5])
    apply_fn = lambda v, *a: model.apply(v, a[0], a[1], a[2], "TASK1",
                                         a[3], a[4], a[5])
    scales = calibrate_activation_scales(apply_fn, variables, [batch])
    bundle = quantize_variables(variables, act_scales=scales)
    live, _ = apply_quantized(model, bundle, batch[0], batch[1], batch[2],
                              "TASK1", batch[3], batch[4], batch[5])

    exported = vexport.export_task_forward(cfg, TASK_CFG, "TASK1",
                                           variables, b, l, r,
                                           quantize="int8_static",
                                           act_scales=scales)
    path = os.path.join(str(tmp_path), "m8s.stablehlo")
    vexport.save_exported(exported, path)
    back = vexport.load_exported(path)
    np.testing.assert_allclose(np.asarray(back.call(bundle, *batch)),
                               np.asarray(live), rtol=1e-5, atol=1e-6)


def test_int8_static_requires_scales():
    import pytest

    cfg = _tiny_cfg()
    with pytest.raises(ValueError, match="act_scales"):
        vexport.export_task_forward(cfg, TASK_CFG, "TASK1", {}, 2, 10, 7,
                                    quantize="int8_static")


def test_int8_export_roundtrip(tmp_path):
    from volta_tpu.models import VoltaForVLTasks

    cfg = _tiny_cfg()
    b, l, r = 4, 10, 7
    batch = _batch(cfg, b, l, r)
    model = VoltaForVLTasks(cfg, TASK_CFG, ("TASK1",))
    variables = model.init(jax.random.PRNGKey(0), batch[0], batch[1],
                           batch[2], "TASK1", batch[3], batch[4], batch[5])
    bundle = quantize_variables(variables)
    live, _ = apply_quantized(model, bundle, batch[0], batch[1], batch[2],
                              "TASK1", batch[3], batch[4], batch[5])

    exported = vexport.export_task_forward(cfg, TASK_CFG, "TASK1",
                                           variables, b, l, r,
                                           quantize="int8")
    path = os.path.join(str(tmp_path), "m8.stablehlo")
    vexport.save_exported(exported, path)
    back = vexport.load_exported(path)
    np.testing.assert_allclose(np.asarray(back.call(bundle, *batch)),
                               np.asarray(live), rtol=1e-5, atol=1e-6)

    # batch-polymorphic + int8 compose: the dynamic per-token quant
    # reshape stays symbolic-dim-safe
    poly = vexport.export_task_forward(cfg, TASK_CFG, "TASK1",
                                       variables, "b", l, r,
                                       quantize="int8")
    for bs in (2, 7):
        out = np.asarray(poly.call(bundle, *_batch(cfg, bs, l, r)))
        assert out.shape == (bs, 9)


def test_int8_export_bf16_residuals(tmp_path):
    """bf16 compute dtype -> the bundle ships bf16 residual params and the
    artifact accepts exactly that bundle."""
    import jax.numpy as jnp

    from volta_tpu.models import VoltaForVLTasks

    cfg = _tiny_cfg()
    cfg.compute_dtype = "bfloat16"
    b, l, r = 4, 10, 7
    batch = _batch(cfg, b, l, r)
    model = VoltaForVLTasks(cfg, TASK_CFG, ("TASK1",))
    variables = model.init(jax.random.PRNGKey(0), batch[0], batch[1],
                           batch[2], "TASK1", batch[3], batch[4], batch[5])
    bundle = quantize_variables(variables, residual_dtype=jnp.bfloat16)
    dtypes = {x.dtype for x in jax.tree.leaves(bundle["params"])}
    assert jnp.float32 not in dtypes

    exported = vexport.export_task_forward(cfg, TASK_CFG, "TASK1",
                                           variables, b, l, r,
                                           quantize="int8")
    out = np.asarray(exported.call(bundle, *batch), np.float32)
    fp, _ = model.apply(variables, batch[0], batch[1], batch[2], "TASK1",
                        batch[3], batch[4], batch[5])
    fp = np.asarray(fp, np.float32)
    assert np.abs(out - fp).max() < 0.2 * (np.abs(fp).max() + 1e-6)


def test_calibration_empty_and_union_merge():
    """ADVICE r4: empty batches must raise cleanly, and batches that
    exercise different Dense sets merge over the union of keys."""
    import pytest

    with pytest.raises(ValueError, match="empty"):
        calibrate_activation_scales(lambda v, *b: None, {}, [])

    import flax.linen as nn

    class TwoHead(nn.Module):
        @nn.compact
        def __call__(self, x):
            # static shape dispatch: each batch shape drives one Dense
            if x.shape[1] == 3:
                return nn.Dense(4, name="head_a")(x)
            return nn.Dense(4, name="head_b")(x)

    m = TwoHead()
    xa = np.ones((2, 3), np.float32) * 2.0
    xb = np.ones((2, 5), np.float32) * 5.0
    variables = {
        "params": {**m.init(jax.random.PRNGKey(0), xa)["params"],
                   **m.init(jax.random.PRNGKey(1), xb)["params"]}}

    # one batch drives head_a, the other head_b: both keys must survive
    scales = calibrate_activation_scales(
        lambda v, x: m.apply(v, x), variables, [(xa,), (xb,)])
    keys = {k.split("/")[-1] for k in scales}
    assert keys == {"head_a", "head_b"}, scales
    by_tail = {k.split("/")[-1]: v for k, v in scales.items()}
    np.testing.assert_allclose(by_tail["head_a"], 2.0 / 127.0, rtol=1e-5)
    np.testing.assert_allclose(by_tail["head_b"], 5.0 / 127.0, rtol=1e-5)
