"""Serving-export tests: the jax.export artifact must reproduce the live
model's eval forward bit-for-bit and round-trip through serialization."""

import os
import sys

import jax
import numpy as np
import pytest

from volta_tpu import export as vexport
from volta_tpu import zoo


TASK_CFG = {"TASK1": {"type": "VL-classifier", "num_labels": 9}}


def _tiny_cfg():
    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg.compute_dtype = "float32"
    cfg.use_pallas = False
    return cfg


def _batch(cfg, b=4, l=10, r=7, seed=0):
    rng = np.random.RandomState(seed)
    return (
        rng.randint(0, cfg.vocab_size, (b, l)).astype(np.int32),
        rng.randn(b, r, cfg.v_feature_size).astype(np.float32),
        rng.rand(b, r, cfg.num_locs).astype(np.float32),
        np.zeros((b, l), np.int32),
        np.ones((b, l), np.int32),
        np.ones((b, r), np.int32),
    )


def test_export_matches_live_forward(tmp_path):
    from volta_tpu.models import VoltaForVLTasks

    cfg = _tiny_cfg()
    b, l, r = 4, 10, 7
    batch = _batch(cfg, b, l, r)
    model = VoltaForVLTasks(cfg, TASK_CFG, ("TASK1",))
    variables = model.init(jax.random.PRNGKey(0), batch[0], batch[1],
                           batch[2], "TASK1", batch[3], batch[4], batch[5])
    live, _ = model.apply(variables, batch[0], batch[1], batch[2], "TASK1",
                          batch[3], batch[4], batch[5])

    # baked mode: self-contained artifact, .call(*batch)
    exported = vexport.export_task_forward(cfg, TASK_CFG, "TASK1",
                                           variables, b, l, r,
                                           bake_weights=True)
    # compilation through the export path may fuse differently -> float
    # noise at the 1e-8 level; semantics must match
    np.testing.assert_allclose(np.asarray(exported.call(*batch)),
                               np.asarray(live), rtol=1e-5, atol=1e-6)

    # parameterized mode (default): .call(variables, *batch), ~KB artifact
    exported_p = vexport.export_task_forward(cfg, TASK_CFG, "TASK1",
                                             variables, b, l, r)
    np.testing.assert_allclose(np.asarray(exported_p.call(variables,
                                                          *batch)),
                               np.asarray(live), rtol=1e-5, atol=1e-6)
    assert len(exported_p.serialize()) < len(exported.serialize())

    # serialize -> file -> deserialize -> same result
    path = os.path.join(str(tmp_path), "m.stablehlo")
    vexport.save_exported(exported, path)
    back = vexport.load_exported(path)
    np.testing.assert_allclose(np.asarray(back.call(*batch)),
                               np.asarray(live), rtol=1e-5, atol=1e-6)
    # shape pinning: a wrong-shaped batch must be rejected
    bad = _batch(cfg, b, l + 1, r)
    with pytest.raises(Exception):
        back.call(*bad)


def test_export_pallas_requires_tpu_platform():
    cfg = _tiny_cfg()
    cfg.use_pallas = True
    with pytest.raises(ValueError, match="tpu"):
        vexport.export_task_forward(cfg, TASK_CFG, "TASK1", {"params": {}},
                                    2, 8, 5, platforms=("cpu",))


def test_export_cli(tmp_path):
    """tools/export_model.py end-to-end on a tiny config."""
    import importlib.util
    from unittest import mock

    cfg = _tiny_cfg()
    cfg_path = os.path.join(str(tmp_path), "model.json")
    open(cfg_path, "w").write(cfg.to_json_string())
    yml = os.path.join(str(tmp_path), "tasks.yml")
    open(yml, "w").write(f"""
TASK1:
  name: VQA
  type: VL-classifier
  num_labels: 9
  loss: BCEWithLogitLoss
  process: normal
  task_id: 1
  dataroot: {tmp_path}
  features_h5path1: ''
  features_h5path2: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 10
  max_region_num: 7
  batch_size: 4
  train_split: train
  val_split: val
  lr: 0.0001
  num_epoch: 1
""")
    out = os.path.join(str(tmp_path), "m.stablehlo")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "export_model", os.path.join(root, "tools", "export_model.py"))
    mod = importlib.util.module_from_spec(spec)
    argv = ["export_model.py", "--config_file", cfg_path,
            "--tasks_config_file", yml, "--task", "1", "--out", out,
            "--batch_size", "4", "--check"]
    with mock.patch.object(sys, "argv", argv):
        spec.loader.exec_module(mod)
        mod.main()
    assert os.path.getsize(out) > 1000


@pytest.mark.parametrize("platform_args", [[], ["--platforms"]])
def test_export_cli_pallas_defaults_tpu_platform(tmp_path, platform_args):
    """--use_pallas without --platforms (absent OR an explicit empty
    list) must pin the artifact to TPU instead of tripping
    export_task_forward's portability check against the current
    (non-tpu) backend — regression for the failed
    logs/bench_serving_int8_r3.log hardware batch."""
    import importlib.util
    from unittest import mock

    cfg = _tiny_cfg()
    cfg_path = os.path.join(str(tmp_path), "model.json")
    open(cfg_path, "w").write(cfg.to_json_string())
    yml = os.path.join(str(tmp_path), "tasks.yml")
    open(yml, "w").write(f"""
TASK1:
  name: VQA
  type: VL-classifier
  num_labels: 9
  loss: BCEWithLogitLoss
  process: normal
  task_id: 1
  dataroot: {tmp_path}
  features_h5path1: ''
  features_h5path2: ''
  train_annotations_jsonpath: ''
  val_annotations_jsonpath: ''
  max_seq_length: 10
  max_region_num: 7
  batch_size: 4
  train_split: train
  val_split: val
  lr: 0.0001
  num_epoch: 1
""")
    out = os.path.join(str(tmp_path), "m.stablehlo")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "export_model", os.path.join(root, "tools", "export_model.py"))
    mod = importlib.util.module_from_spec(spec)
    argv = ["export_model.py", "--config_file", cfg_path,
            "--tasks_config_file", yml, "--task", "1", "--out", out,
            "--batch_size", "4", "--use_pallas"] + platform_args
    with mock.patch.object(sys, "argv", argv):
        spec.loader.exec_module(mod)
        mod.main()
    assert os.path.getsize(out) > 1000
    back = vexport.load_exported(out)
    assert back.platforms == ("tpu",)


def test_export_polymorphic_batch(tmp_path):
    """batch_size='b' serves any batch size from one artifact."""
    from volta_tpu.models import VoltaForVLTasks

    cfg = _tiny_cfg()
    l, r = 10, 7
    b4 = _batch(cfg, 4, l, r)
    model = VoltaForVLTasks(cfg, TASK_CFG, ("TASK1",))
    variables = model.init(jax.random.PRNGKey(0), b4[0], b4[1], b4[2],
                           "TASK1", b4[3], b4[4], b4[5])
    exported = vexport.export_task_forward(cfg, TASK_CFG, "TASK1",
                                           variables, "b", l, r)
    path = os.path.join(str(tmp_path), "poly.stablehlo")
    vexport.save_exported(exported, path)
    back = vexport.load_exported(path)
    for b in (1, 4, 9):
        batch = _batch(cfg, b, l, r, seed=b)
        live, _ = model.apply(variables, batch[0], batch[1], batch[2],
                              "TASK1", batch[3], batch[4], batch[5])
        np.testing.assert_allclose(np.asarray(back.call(variables, *batch)),
                                   np.asarray(live), rtol=1e-4, atol=1e-5)
