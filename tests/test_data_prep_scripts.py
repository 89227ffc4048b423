"""Offline data-prep transforms (VERDICT r5 #10): caption extraction,
CC caption maps, detector-TSV merge — every non-network step of the
reference data/ recipes, runnable on synthetic fixtures."""

import json
import os
import subprocess
import sys
import zlib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(script, *args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, os.path.join(REPO, script),
                          *args], capture_output=True, text=True, cwd=REPO,
                         env=env)
    assert out.returncode == 0, out.stderr
    return out.stdout


@pytest.fixture
def karpathy(tmp_path):
    def img(split, i, coco=False):
        e = {"split": split,
             "sentences": [{"raw": f"caption {i} a"},
                           {"raw": f"caption {i} b"}]}
        if coco:
            e["cocoid"] = 1000 + i
            e["filename"] = f"COCO_{i}.jpg"
        else:
            e["filename"] = f"{2000 + i}.jpg"
        return e

    fl = {"images": [img("train", 0), img("val", 1), img("test", 2),
                     img("train", 3)]}
    co = {"images": [img("train", 0, True), img("restval", 1, True),
                     img("val", 2, True), img("test", 3, True),
                     img("test", 4, True)]}
    fl_p = tmp_path / "dataset_flickr30k.json"
    co_p = tmp_path / "dataset_coco.json"
    json.dump(fl, open(fl_p, "w"))
    json.dump(co, open(co_p, "w"))
    return str(fl_p), str(co_p), tmp_path


def _read_jsonl(path):
    return [json.loads(line) for line in open(path)]


def test_extract_captions_flickr30k(karpathy):
    fl_p, _, tmp = karpathy
    run("tools/extract_captions.py", "--infile", fl_p, "--outdir",
        str(tmp / "ann"), "--dataset", "flickr30k", "--split", "train")
    recs = _read_jsonl(tmp / "ann" / "train_ann.jsonl")
    assert len(recs) == 2
    assert recs[0]["id"] == "2000" and recs[0]["img_path"] == "2000.jpg"
    assert recs[0]["sentences"] == ["caption 0 a", "caption 0 b"]


def test_extract_captions_coco_restval_and_test1k(karpathy):
    _, co_p, tmp = karpathy
    # train absorbs restval (reference: data/mscoco/extract_captions.py)
    run("tools/extract_captions.py", "--infile", co_p, "--outdir",
        str(tmp / "ann"), "--dataset", "mscoco", "--split", "train")
    recs = _read_jsonl(tmp / "ann" / "train_ann.jsonl")
    assert [r["id"] for r in recs] == [1000, 1001]
    assert all("img_path" not in r for r in recs)

    ids = tmp / "test1k_ids.txt"
    ids.write_text("1003\n")
    run("tools/extract_captions.py", "--infile", co_p, "--outdir",
        str(tmp / "ann"), "--dataset", "mscoco", "--split", "test1k",
        "--test1k_ids", str(ids))
    recs = _read_jsonl(tmp / "ann" / "test1k_ann.jsonl")
    assert [r["id"] for r in recs] == [1003]


def test_cc_captions_crc_ids_and_feature_filter(tmp_path):
    urls = ["http://a.example/img1.jpg", "http://b.example/img2.png",
            "http://c.example/img3.jpg"]
    tsv = tmp_path / "gcc.tsv"
    tsv.write_text("".join(f"caption {i}\t{u}\n"
                           for i, u in enumerate(urls)))
    ids = [str(zlib.crc32(u.encode()) & 0xFFFFFFFF) for u in urls]

    out = tmp_path / "caption_train.json"
    run("tools/cc_captions.py", "--gcc_tsv", str(tsv), "--out", str(out))
    caps = json.load(open(out))
    assert set(caps) == set(ids)
    assert caps[ids[1]] == "caption 1"

    # valid-id filtering: only ids present in the detector TSV survive
    feats = tmp_path / "valid_obj36-36.tsv.0"
    feats.write_text(f"{ids[0]}\t480\t640\trest\n")
    out2 = tmp_path / "caption_valid.json"
    stdout = run("tools/cc_captions.py", "--gcc_tsv", str(tsv), "--out",
                 str(out2), "--features_tsv", str(feats))
    caps2 = json.load(open(out2))
    assert set(caps2) == {ids[0]}
    assert "filtered" in stdout


def test_merge_detector_tsv_dedupes(tmp_path):
    out = tmp_path / "valid_obj36-36.tsv"
    (tmp_path / "valid_obj36-36.tsv.0").write_text(
        "id1\t480\t640\tx\nid2\t480\t640\ty\n")
    (tmp_path / "valid_obj36-36.tsv.1").write_text(
        "id2\t480\t640\tdup\nid3\t480\t640\tz\n")
    stdout = run("tools/merge_detector_tsv.py", "--out", str(out),
                 "--total_group", "2")
    assert "3 new rows" in stdout
    rows = [line.split("\t")[0] for line in open(out)]
    assert rows == ["id1", "id2", "id3"]
