"""save_pretrained / cached_path round trips (reference: volta/utils.py
82-229 cached_path, 250-360 from_pretrained/save_pretrained)."""

import os

import numpy as np
import pytest

import jax

from __graft_entry__ import _flagship, _task_cfg, _vqa_batch
from volta_tpu.checkpoint import cached_path, from_pretrained, save_pretrained
from volta_tpu.models import VoltaForVLTasks


def _tiny_model_params():
    cfg = _flagship(small=True)
    cfg.compute_dtype = "float32"
    task_cfg = _task_cfg(num_labels=8)
    model = VoltaForVLTasks(cfg, task_cfg, ("TASK1",))
    b = _vqa_batch(cfg, 2, 6, 4)
    params = model.init(jax.random.PRNGKey(0), b["question"], b["features"],
                        b["spatials"], "TASK1", b["segment_ids"],
                        b["input_mask"], b["image_mask"])["params"]
    return cfg, jax.device_get(params)


def test_save_then_from_pretrained_roundtrip(tmp_path):
    cfg, params = _tiny_model_params()
    out = save_pretrained(str(tmp_path / "bundle"), cfg, params)
    assert os.path.exists(os.path.join(out, "flax_model.msgpack"))
    assert os.path.exists(os.path.join(out, "config.json"))

    # load onto a reinitialised tree: every leaf must match the saved one
    fresh = jax.tree.map(lambda x: np.zeros_like(x), params)
    loaded, report = from_pretrained(cfg, {"params": fresh}, out)
    assert report["loaded"] == ["<flax-bundle>"]
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(loaded["params"]),
            jax.tree_util.tree_leaves_with_path(params)):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))


def test_cached_path_local_and_errors(tmp_path):
    f = tmp_path / "weights.bin"
    f.write_bytes(b"x")
    assert cached_path(str(f)) == str(f)
    with pytest.raises(FileNotFoundError):
        cached_path(str(tmp_path / "missing.bin"))
    with pytest.raises(ValueError):
        cached_path("ftp://nowhere/x.bin")


def test_cached_path_uses_existing_cache(tmp_path):
    import hashlib

    url = "https://example.invalid/model.bin"
    cache = tmp_path / "cache"
    cache.mkdir()
    path = cache / hashlib.sha256(url.encode()).hexdigest()
    path.write_bytes(b"cached-weights")
    assert cached_path(url, str(cache)) == str(path)


def test_cached_path_offline_error_names_cache_location(tmp_path):
    url = "https://example.invalid/model.bin"
    with pytest.raises(OSError) as e:
        cached_path(url, str(tmp_path))
    assert str(tmp_path) in str(e.value)
