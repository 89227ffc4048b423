import json
import os

import numpy as np
import pytest

import fixtures
from volta_tpu.data import ImageFeaturesReader
from volta_tpu.data.tokenization import BertTokenizer
from volta_tpu.data.datasets import (FlickrGroundingDataset,
                                     GuessWhatDataset,
                                     GuessWhatPointingDataset, VCRDataset,
                                     Visual7wPointingDataset,
                                     VisualEntailmentDataset,
                                     ReferExpressionDataset)

FS = 32


@pytest.fixture
def tok(tmp_path):
    return BertTokenizer(fixtures.make_vocab(str(tmp_path)))


def reader(tmp_path, ids, name="f.lmdb", num_boxes=6):
    path = fixtures.make_features_lmdb(str(tmp_path), ids, num_boxes=num_boxes,
                                       feature_size=FS, name=name)
    return ImageFeaturesReader(path, num_locs=5, add_global_imgfeat="first",
                               feature_size=FS)


def test_guesswhat(tmp_path, tok):
    path = tmp_path / "guesswhat.train.jsonl"
    with open(path, "w") as f:
        for i in range(3):
            f.write(json.dumps({
                "id": i, "image": {"id": 100 + i}, "object_id": 7,
                "qas": [{"id": i * 10, "question": "is it red ?",
                         "answer": "Yes"},
                        {"id": i * 10 + 1, "question": "is it a dog ?",
                         "answer": "No"}],
                "objects": [],
            }) + "\n")
    rd = reader(tmp_path, [100, 101, 102])
    ds = GuessWhatDataset("GuessWhat", str(tmp_path), str(path), "train",
                          rd, None, tok, max_seq_length=10, max_region_num=6)
    assert len(ds) == 6
    s = ds[0]
    assert s["target"].tolist() == [1.0, 0.0, 0.0]


def test_visual_entailment(tmp_path, tok):
    path = tmp_path / "snli.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({
            "Flickr30K_ID": "55", "sentence2": "a dog plays",
            "annotator_labels": ["entailment", "entailment", "neutral"],
            "gold_label": "entailment"}) + "\n")
    rd = reader(tmp_path, [55])
    ds = VisualEntailmentDataset("VisualEntailment", str(tmp_path),
                                 str(path), "train", rd, None, tok,
                                 max_seq_length=10, max_region_num=6)
    s = ds[0]
    np.testing.assert_allclose(s["target"], [0, 1 / 3, 2 / 3])


def test_vcr(tmp_path, tok):
    ann = tmp_path / "vcr.jsonl"
    meta_dir = tmp_path / "vcr1images"
    meta_dir.mkdir()
    json.dump({"names": ["person", "dog"]},
              open(meta_dir / "m0.json", "w"))
    with open(ann, "w") as f:
        f.write(json.dumps({
            "question": ["what", "is", [0], "doing", "?"],
            "answer_choices": [["play", "##s"], ["run"], ["the", "ball"],
                               [[1], "run", "##s"]],
            "answer_label": 1,
            "rationale_choices": [["a"], ["b"], ["c"], ["d"]],
            "rationale_label": 2,
            "img_id": "train-37", "img_fn": "img.jpg",
            "metadata_fn": "m0.json", "annot_id": "train-12",
        }) + "\n")
    rd = reader(tmp_path, ["m0.jpg"], name="det.lmdb")
    gt = reader(tmp_path, ["m0.jpg"], name="gt.lmdb", num_boxes=4)
    ds = VCRDataset("VCR_Q-A", str(tmp_path), str(ann), "train", rd, gt,
                    tok, max_seq_length=16, max_region_num=10)
    s = ds[0]
    assert s["question"].shape == (4, 16)
    assert int(s["target"]) == 1
    assert s["features"].shape == (10, FS)
    dsr = VCRDataset("VCR_QA-R", str(tmp_path), str(ann), "train", rd, gt,
                     tok, max_seq_length=16, max_region_num=10)
    assert int(dsr[0]["target"]) == 2


def test_visual7w(tmp_path, tok):
    data = {
        "boxes": [{"box_id": i, "x": 10 * i, "y": 5, "width": 20,
                   "height": 30} for i in range(5)],
        "images": [{
            "split": "train", "image_id": 900,
            "qa_pairs": [{"qa_id": 1, "question": "which dog ?",
                          "multiple_choices": [0, 1, 2], "answer": 3}],
        }],
    }
    json.dump(data, open(tmp_path / "dataset.json", "w"))
    rd = reader(tmp_path, ["900"], name="det.lmdb")
    gt = reader(tmp_path, ["900"], name="gt.lmdb", num_boxes=5)
    ds = Visual7wPointingDataset(
        "Visual7w", str(tmp_path), "", "train", rd, gt, tok,
        max_seq_length=10, max_region_num=110)
    s = ds[0]
    assert s["multi_choice_ids"].shape == (4,)
    assert s["target"].shape == (4, 1)


def test_flickr_grounding(tmp_path, tok):
    (tmp_path / "Annotations").mkdir()
    (tmp_path / "Sentences").mkdir()
    with open(tmp_path / "train.txt", "w") as f:
        f.write("777\n")
    xml = """<annotation><size><width>640</width><height>480</height></size>
    <object><name>42</name><bndbox><xmin>10</xmin><ymin>10</ymin>
    <xmax>100</xmax><ymax>90</ymax></bndbox></object></annotation>"""
    open(tmp_path / "Annotations" / "777.xml", "w").write(xml)
    open(tmp_path / "Sentences" / "777.txt", "w").write(
        "[/EN#42/animals a red dog] plays with [/EN#43/other the ball]\n")
    rd = reader(tmp_path, ["777"], name="det.lmdb")
    gt = reader(tmp_path, ["777"], name="gt.lmdb", num_boxes=3)
    ds = FlickrGroundingDataset(
        "FlickrGrounding", str(tmp_path), "", "train", rd, gt, tok,
        max_seq_length=10, max_region_num=12)
    assert len(ds) == 1  # only the phrase with a box
    s = ds[0]
    assert s["target"].shape == (12, 1)


def test_guesswhat_pointing(tmp_path, tok):
    path = tmp_path / "guesswhat.train.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({
            "id": 5, "image": {"id": 300}, "object_id": 2,
            "qas": [{"id": 1, "question": "is it red ?", "answer": "Yes"}],
            "objects": [
                {"id": 1, "bbox": [0, 0, 30, 30]},
                {"id": 2, "bbox": [50, 50, 30, 30]},
            ],
        }) + "\n")
    rd = reader(tmp_path, ["300"], name="det.lmdb")
    gt = reader(tmp_path, ["300"], name="gt.lmdb", num_boxes=3)
    ds = GuessWhatPointingDataset(
        "GuessWhatPointing", str(tmp_path), str(path), "train", rd, gt, tok,
        max_seq_length=16, max_region_num=110)
    s = ds[0]
    assert s["multi_choice_ids"].shape == (2,)
    assert s["target"].shape == (2, 1)


def test_visdial(tmp_path, tok):
    import json as _json
    from volta_tpu.data.datasets import VisDialDataset

    data = {"data": {
        "questions": ["is it red ?", "is it a dog ?", "what color ?"],
        "answers": ["yes", "no", "red", "blue"],
        "dialogs": [{
            "image_id": 400, "caption": "a red ball",
            "dialog": [{"question": i % 3, "answer": i % 4,
                        "gt_index": i % 4,
                        "answer_options": list(range(4)) * 25}
                       for i in range(10)],
        }],
    }}
    path = tmp_path / "visdial.json"
    _json.dump(data, open(path, "w"))
    rd = reader(tmp_path, ["400"])
    ds = VisDialDataset("VisualDialog", str(tmp_path), str(path), "train",
                        rd, None, tok, max_seq_length=32, max_region_num=6)
    s = ds[0]
    assert s["question"].shape == (10, 4, 32)
    assert s["target"].shape == (10,)
    assert s["question"][0, 0, 0] == tok.cls_id


def test_visdial_option_domain(tmp_path, tok):
    """Candidate sampling must index the per-round answer_options list,
    never the global answers list (they differ in length; regression for
    an IndexError surfaced by the synthetic corpus where
    len(answers)=120 > len(answer_options)=100)."""
    import json as _json
    from volta_tpu.data.datasets import VisDialDataset

    n_answers = 120  # global pool larger than any option list
    data = {"data": {
        "questions": ["q ?"],
        "answers": [f"a{i}" for i in range(n_answers)],
        "dialogs": [{
            "image_id": 400, "caption": "cap",
            # short option lists (8 < max_num_option would break; use 8)
            "dialog": [{"question": 0, "answer": 117, "gt_index": 5,
                        "answer_options": [110 + j for j in range(8)]}
                       for _ in range(10)],
        }],
    }}
    path = tmp_path / "visdial_domain.json"
    _json.dump(data, open(path, "w"))
    rd = reader(tmp_path, ["400"])
    ds = VisDialDataset("VisualDialog", str(tmp_path), str(path), "train",
                        rd, None, tok, max_seq_length=16, max_region_num=6)
    s = ds[0]  # old code: IndexError via permutation over len(answers)
    assert s["question"].shape == (10, 4, 16)
    # the positive (slot 0) encodes answer_options[gt_index] == answers[115]
    opts = ds._round_options(ds.entries[0]["dialog"][0])
    assert opts[0] == 5 and all(0 <= c < 8 for c in opts)


def test_dense_caption_and_madlibs(tmp_path, tok):
    import json as _json
    from volta_tpu.data.datasets import (ReferDenseCaptionDataset,
                                         VisMadLibsDataset)

    anns = [{"id": 500, "regions": [
        {"phrase": "a red ball", "region_id": 1,
         "x": 10, "y": 10, "width": 40, "height": 40}]}]
    path = tmp_path / "dense.json"
    _json.dump(anns, open(path, "w"))
    rd = reader(tmp_path, ["500"])
    # "train" slices off the last 10k images (reference semantics), so the
    # tiny fixture uses the test split which keeps the tail
    ds = ReferDenseCaptionDataset(
        "ReferDenseCaption", str(tmp_path), str(path), "test", rd, None,
        tok, max_seq_length=10, max_region_num=6)
    s = ds[0]
    assert s["target"].shape == (6, 1)

    ml = [{"image_id": 500, "question": "the ball is", "labels": [2],
           "scores": [1.0], "question_id": 0}]
    mpath = tmp_path / "madlibs.json"
    _json.dump(ml, open(mpath, "w"))
    ds2 = VisMadLibsDataset("VisMadLibs", str(tmp_path), str(mpath), "train",
                            rd, None, tok, max_seq_length=10,
                            max_region_num=6, num_labels=5)
    s2 = ds2[0]
    assert s2["target"].tolist() == [0, 0, 1, 0, 0]


def test_visdial_short_option_list(tmp_path, tok):
    """A round whose answer_options list is shorter than max_num_option
    must pad by cycling candidates instead of walking off the permutation
    (regression: IndexError when len(answer_options) <= max_num_option)."""
    import json as _json
    from volta_tpu.data.datasets import VisDialDataset

    data = {"data": {
        "questions": ["q ?"],
        "answers": ["a", "b", "c"],
        "dialogs": [{
            "image_id": 400, "caption": "cap",
            # 3 options < max_num_option (4): only 2 non-gt available
            "dialog": [{"question": 0, "answer": 1, "gt_index": 1,
                        "answer_options": [0, 1, 2]}
                       for _ in range(10)],
        }],
    }}
    path = tmp_path / "visdial_short.json"
    _json.dump(data, open(path, "w"))
    rd = reader(tmp_path, ["400"])
    ds = VisDialDataset("VisualDialog", str(tmp_path), str(path), "train",
                        rd, None, tok, max_seq_length=16, max_region_num=6)
    s = ds[0]
    assert s["question"].shape == (10, 4, 16)
    opts = ds._round_options(ds.entries[0]["dialog"][0])
    assert len(opts) == 4 and opts[0] == 1
    assert all(0 <= c < 3 for c in opts)
