"""Mask codec + REFER API tests (mirrors apex-style L0 kernel-vs-reference
testing for the native extension)."""

import json
import os
import pickle

import numpy as np
import pytest

from volta_tpu.tools import _mask
from volta_tpu.tools.refer import REFER


def random_mask(h, w, seed):
    rng = np.random.RandomState(seed)
    m = np.zeros((h, w), np.uint8)
    for _ in range(3):
        y, x = rng.randint(0, h - 5), rng.randint(0, w - 5)
        m[y:y + rng.randint(2, 6), x:x + rng.randint(2, 6)] = 1
    return m


def test_encode_decode_roundtrip():
    for seed in range(5):
        m = random_mask(17, 23, seed)
        rle = _mask.encode(m)
        np.testing.assert_array_equal(_mask.decode(rle), m)
        assert _mask.area(rle) == int(m.sum())


def test_bbox():
    m = np.zeros((20, 30), np.uint8)
    m[3:9, 5:12] = 1
    rle = _mask.encode(m)
    np.testing.assert_allclose(_mask.to_bbox(rle), [5, 3, 7, 6])


def test_merge_union_intersect():
    a = random_mask(15, 15, 1)
    b = random_mask(15, 15, 2)
    ra, rb = _mask.encode(a), _mask.encode(b)
    u = _mask.decode(_mask.merge([ra, rb]))
    np.testing.assert_array_equal(u, a | b)
    it = _mask.decode(_mask.merge([ra, rb], intersect=True))
    np.testing.assert_array_equal(it, a & b)


def test_string_roundtrip():
    m = random_mask(11, 13, 3)
    rle = _mask.encode(m)
    s = _mask.to_string(rle)
    rle2 = {"size": rle["size"], "counts": s}
    np.testing.assert_array_equal(_mask.decode(rle2), m)


def test_polygon_rasterization():
    # a 4x4 square polygon from (2,2) to (6,6)
    rles = _mask.fr_poly([[2, 2, 6, 2, 6, 6, 2, 6]], 10, 10)
    m = _mask.decode(rles[0])
    assert m[3, 3] == 1 and m[5, 5] == 1
    assert m[0, 0] == 0 and m[8, 8] == 0
    assert 12 <= m.sum() <= 20  # ~16 pixels


def test_native_lib_loaded():
    assert _mask._load() is not None, "C++ maskrle library failed to build"


@pytest.fixture
def refer_root(tmp_path):
    refs = [{
        "ref_id": 1, "ann_id": 10, "image_id": 100, "category_id": 1,
        "split": "train",
        "sentences": [{"sent_id": 0, "raw": "the red ball",
                       "tokens": ["the", "red", "ball"]}],
        "sent_ids": [0],
    }, {
        "ref_id": 2, "ann_id": 11, "image_id": 100, "category_id": 2,
        "split": "val",
        "sentences": [{"sent_id": 1, "raw": "a dog", "tokens": ["a", "dog"]}],
        "sent_ids": [1],
    }]
    instances = {
        "annotations": [
            {"id": 10, "image_id": 100, "category_id": 1,
             "bbox": [2, 2, 4, 4],
             "segmentation": [[2, 2, 6, 2, 6, 6, 2, 6]], "area": 16},
            {"id": 11, "image_id": 100, "category_id": 2,
             "bbox": [0, 0, 3, 3],
             "segmentation": [[0, 0, 3, 0, 3, 3, 0, 3]], "area": 9},
        ],
        "images": [{"id": 100, "height": 12, "width": 12}],
        "categories": [{"id": 1, "name": "ball"}, {"id": 2, "name": "dog"}],
    }
    base = tmp_path / "refcoco"
    base.mkdir()
    with open(base / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)
    json.dump(instances, open(base / "instances.json", "w"))
    return str(tmp_path)


def test_refer_api(refer_root):
    refer = REFER(refer_root, dataset="refcoco", splitBy="unc")
    assert refer.getRefIds(split="train") == [1]
    assert refer.getRefIds(split="val") == [2]
    assert refer.getRefBox(1) == [2, 2, 4, 4]
    assert refer.getImgIds([1]) == [100]
    assert sorted(refer.getAnnIds(image_ids=[100])) == [10, 11]
    out = refer.get_mask(refer.Refs[1])
    assert out["mask"].shape == (12, 12)
    assert out["area"] > 0


def test_show_ref_and_mask_render(refer_root, tmp_path):
    """showRef/showMask PNG rendering (reference: tools/refer/refer.py:
    236-277, 329-333): polygon outlines, bbox mode, and the mask view all
    produce non-empty PNGs without a display."""
    import matplotlib
    matplotlib.use("Agg")

    refer = REFER(refer_root, dataset="refcoco", splitBy="unc")
    ref = refer.Refs[1]
    for name, call in [
            ("seg.png", lambda p: refer.showRef(ref, "seg", save=p)),
            ("box.png", lambda p: refer.showRef(ref, "box", save=p)),
            ("mask.png", lambda p: refer.showMask(ref, save=p))]:
        path = str(tmp_path / name)
        call(path)
        assert os.path.getsize(path) > 500, name
    # PNG magic
    with open(str(tmp_path / "mask.png"), "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
