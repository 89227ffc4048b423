import numpy as np
import pytest

from volta_tpu.data import DataLoader, ImageFeaturesReader
from volta_tpu.data.tokenization import BertTokenizer
from volta_tpu.data.datasets import (NLVR2Dataset, RetrievalDataset,
                                     RetrievalDatasetVal,
                                     VQAClassificationDataset)

import fixtures


@pytest.fixture
def tok(tmp_path):
    return BertTokenizer(fixtures.make_vocab(str(tmp_path)))


def test_tokenizer_wordpiece(tok):
    toks = tok.tokenize("The dogs play.")
    assert "dog" in toks and "##s" in toks
    ids = tok.encode("a dog")
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id


def test_features_reader(tmp_path):
    ids = [10, 11, 12]
    path = fixtures.make_features_lmdb(str(tmp_path), ids, num_boxes=6,
                                       feature_size=32)
    rd = ImageFeaturesReader(path, num_locs=5, add_global_imgfeat="first",
                             feature_size=32)
    feats, num_boxes, loc, loc_ori = rd[10]
    assert feats.shape == (7, 32)  # +global
    assert num_boxes == 7
    assert loc.shape == (7, 5)
    # normalised boxes in [0,1]; area channel positive
    assert loc[1:, :4].max() <= 1.0 + 1e-6
    assert (loc[:, 4] > 0).all()
    # global row is the mean of the others, at position 0
    np.testing.assert_allclose(feats[0], feats[1:].mean(0), rtol=1e-5)


def test_vqa_dataset_and_loader(tmp_path, tok):
    ids = [10, 11, 12]
    feat_path = fixtures.make_features_lmdb(str(tmp_path), ids,
                                            feature_size=32)
    fixtures.make_vqa_annotations(str(tmp_path), ids, n_questions=12,
                                  num_labels=9)
    rd = ImageFeaturesReader(feat_path, num_locs=5,
                             add_global_imgfeat="first", feature_size=32)
    ds = VQAClassificationDataset(
        task="VQA", dataroot=str(tmp_path), annotations_jsonpath="",
        split="train", image_features_reader=rd,
        gt_image_features_reader=None, tokenizer=tok,
        max_seq_length=12, max_region_num=6, num_locs=5,
        add_global_imgfeat="first")
    assert len(ds) == 12
    s = ds[0]
    assert s["features"].shape == (7, 32)
    assert s["question"].shape == (12,)
    assert s["target"].shape == (9,)
    assert s["target"].sum() == 1.0

    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["features"].shape == (4, 7, 32)
    assert batches[0]["question"].dtype == np.int32

    # host sharding covers everything exactly once
    seen = []
    for shard in range(2):
        dls = DataLoader(ds, batch_size=4, shuffle=False, num_shards=2,
                         shard_index=shard, num_workers=0)
        for b in dls:
            seen.extend(b["question_id"].tolist())
    assert sorted(seen) == list(range(12))


def test_nlvr2_dataset(tmp_path, tok):
    ann_path, image_ids = fixtures.make_nlvr2_annotations(str(tmp_path), n=6)
    feat_path = fixtures.make_features_lmdb(str(tmp_path), image_ids,
                                            feature_size=32)
    rd = ImageFeaturesReader(feat_path, num_locs=5,
                             add_global_imgfeat="first", feature_size=32)
    ds = NLVR2Dataset(
        task="NLVR2", dataroot=str(tmp_path), annotations_jsonpath=ann_path,
        split="train", image_features_reader=rd,
        gt_image_features_reader=None, tokenizer=tok,
        max_seq_length=10, max_region_num=6, num_locs=5,
        add_global_imgfeat="first")
    s = ds[0]
    assert s["features"].shape == (14, 32)  # 2 x (6+1)
    assert s["target"].shape == (2,)


def test_retrieval_datasets(tmp_path, tok):
    ids = list(range(20, 27))
    feat_path = fixtures.make_features_lmdb(str(tmp_path), ids,
                                            feature_size=32)
    ann = fixtures.make_retrieval_annotations(str(tmp_path), ids)
    rd = ImageFeaturesReader(feat_path, num_locs=5,
                             add_global_imgfeat="first", feature_size=32)
    ds = RetrievalDataset(
        task="RetrievalFlickr30k", dataroot=str(tmp_path),
        annotations_jsonpath=ann, split="val", image_features_reader=rd,
        gt_image_features_reader=None, tokenizer=tok,
        max_seq_length=10, max_region_num=6, num_locs=5,
        add_global_imgfeat="first")
    s = ds[0]
    assert s["features"].shape == (4, 7, 32)  # 4-way
    assert s["question"].shape == (4, 10)
    assert int(s["target"]) == 0

    dsv = RetrievalDatasetVal(
        task="RetrievalFlickr30k", dataroot=str(tmp_path),
        annotations_jsonpath=ann, split="val", image_features_reader=rd,
        gt_image_features_reader=None, tokenizer=tok,
        max_seq_length=10, max_region_num=6, num_locs=5,
        add_global_imgfeat="first", gallery_chunk=4)
    assert dsv.num_chunks == 2
    assert len(dsv) == len(dsv.entries) * 2
    s = dsv[0]
    assert s["features"].shape == (4, 7, 32)
    assert s["target"].shape == (4,)
    # the positive image appears in exactly one chunk
    tot = dsv[0]["target"].sum() + dsv[1]["target"].sum()
    assert tot == 1.0


def test_roberta_bpe_tokenizer(tmp_path):
    import json
    from volta_tpu.data.bpe import RobertaTokenizer, bytes_to_unicode

    # tiny byte-level BPE vocab: merges building "he"+"llo"-ish pieces
    b2u = bytes_to_unicode()
    enc = lambda s: "".join(b2u[b] for b in s.encode())
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    pieces = [enc("h"), enc("e"), enc("l"), enc("o"), enc(" h"),
              enc("he"), enc(" he"), enc("ll"), enc("llo"), enc("hello"),
              enc(" hello")]
    for p in pieces:
        vocab.setdefault(p, len(vocab))
    json.dump(vocab, open(tmp_path / "vocab.json", "w"))
    merges = ["#version: 0.2",
              f"{enc('h')} {enc('e')}",
              f"{enc('l')} {enc('l')}",
              f"{enc('ll')} {enc('o')}",
              f"{enc('he')} {enc('llo')}",
              f"{enc(' ')} {enc('hello')}"]
    open(tmp_path / "merges.txt", "w").write("\n".join(merges) + "\n")

    tok = RobertaTokenizer(str(tmp_path / "vocab.json"),
                           str(tmp_path / "merges.txt"))
    toks = tok.tokenize("hello hello")
    assert toks[0] == enc("hello")
    assert toks[1] == enc(" hello")
    ids = tok.encode("hello")
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id


def test_vqa_entry_cache(tmp_path, tok):
    import os
    ids = [10, 11]
    feat_path = fixtures.make_features_lmdb(str(tmp_path), ids,
                                            feature_size=32)
    fixtures.make_vqa_annotations(str(tmp_path), ids, n_questions=6,
                                  num_labels=9)
    rd = ImageFeaturesReader(feat_path, num_locs=5,
                             add_global_imgfeat="first", feature_size=32)
    kw = dict(task="VQA", dataroot=str(tmp_path), annotations_jsonpath="",
              split="train", image_features_reader=rd,
              gt_image_features_reader=None, tokenizer=tok,
              max_seq_length=12, max_region_num=6, num_locs=5,
              add_global_imgfeat="first")
    ds1 = VQAClassificationDataset(**kw)
    cache = os.path.join(str(tmp_path), "cache", "VQA_train_12.pkl")
    assert os.path.exists(cache)
    ds2 = VQAClassificationDataset(**kw)  # loads from cache
    np.testing.assert_array_equal(ds1[0]["question"], ds2[0]["question"])
    np.testing.assert_array_equal(ds1[3]["target"], ds2[3]["target"])
