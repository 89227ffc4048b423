"""Caption-metric parity vs the reference's vendored scorers.

The reference scorer sources (tools/refer/evaluation/{bleu,cider,rouge})
are Python 2; they are loaded here through a mechanical py2->py3 source
shim (iteritems/xrange/print/tuple-parameter rewrites — no semantic
changes) and run side by side with volta_tpu.tools.ref_evaluation on the
reference's own fixture predictions
(tools/refer/test/sample_expressions_testA.json) against deterministic
synthetic ground-truth sentences.

METEOR has no oracle: the reference wraps meteor-1.5.jar which is not in
the repo (evaluation/meteor/ contains only the wrapper), so the jar-free
substitute is property-tested instead (documented in ref_evaluation.py).
"""

import json
import math
import os
import random
import re
import types

import pytest

from volta_tpu.tools.ref_evaluation import (
    Bleu, Cider, Meteor, PTBTokenizer, RefEvaluation, Rouge,
    ptb_tokenize_sentence,
)

REF_EVAL = "/root/reference/tools/refer/evaluation"
FIXTURE = "/root/reference/tools/refer/test/sample_expressions_testA.json"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_EVAL), reason="reference checkout not present")


def _load_ref_module(relpath: str, name: str) -> types.ModuleType:
    """Load a py2 reference scorer through a mechanical py3 shim."""
    with open(os.path.join(REF_EVAL, relpath)) as f:
        src = f.read()
    src = src.replace(".iteritems()", ".items()")
    src = src.replace("xrange", "range")
    src = src.replace(
        "def cook_test(test, (reflen, refmaxcounts), eff=None, n=4):",
        "def cook_test(test, refpair, eff=None, n=4):\n"
        "    (reflen, refmaxcounts) = refpair")
    src = re.sub(r"(?m)^(\s*)print (.+)$", r"\1print(\2)", src)
    mod = types.ModuleType(name)
    exec(compile(src, relpath, "exec"), mod.__dict__)
    return mod


def _fixture_pairs(limit=None):
    """(gts, res) dicts of PTB-tokenized sentences: fixture predictions +
    three deterministic synthetic references each."""
    with open(FIXTURE) as f:
        preds = json.load(f)["predictions"]
    if limit:
        preds = preds[:limit]
    rng = random.Random(20260820)
    vocab = ["the", "a", "man", "woman", "person", "left", "right", "red",
             "blue", "white", "shirt", "jacket", "holding", "standing",
             "next", "to", "in", "on", "front", "behind", "small", "big"]
    gts, res = {}, {}
    for p in preds:
        rid = p["ref_id"]
        sent = ptb_tokenize_sentence(p["sent"])
        if not sent:
            continue
        words = sent.split()
        shuffled = words[:]
        rng.shuffle(shuffled)
        extra = " ".join(rng.choices(vocab, k=rng.randint(2, 6)))
        gts[rid] = [sent if rng.random() < 0.3 else extra,
                    " ".join(shuffled),
                    " ".join(words + rng.choices(vocab, k=2))]
        res[rid] = [sent]
    return gts, res


@needs_reference
def test_bleu_matches_reference_oracle():
    gts, res = _fixture_pairs()
    ours, ours_per = Bleu(4).compute_score(gts, res)
    ref = _load_ref_module("bleu/bleu_scorer.py", "ref_bleu_scorer")
    bs = ref.BleuScorer(n=4)
    for rid in gts:
        bs += (res[rid][0], gts[rid])
    score, per = bs.compute_score(option="closest")
    for k in range(4):
        assert math.isclose(ours[k], score[k], rel_tol=1e-12), k
        for a, b in zip(ours_per[k], per[k]):
            assert math.isclose(a, b, rel_tol=1e-12)


@needs_reference
def test_cider_matches_reference_oracle():
    gts, res = _fixture_pairs()
    ours, ours_per = Cider().compute_score(gts, res)
    ref = _load_ref_module("cider/cider_scorer.py", "ref_cider_scorer")
    cs = ref.CiderScorer(n=4, sigma=6.0)
    for rid in gts:
        cs += (res[rid][0], gts[rid])
    score, per = cs.compute_score()
    assert math.isclose(ours, float(score), rel_tol=1e-10)
    for a, b in zip(ours_per, per):
        assert math.isclose(a, float(b), rel_tol=1e-10, abs_tol=1e-12)


@needs_reference
def test_rouge_matches_reference_oracle():
    gts, res = _fixture_pairs()
    ours, ours_per = Rouge().compute_score(gts, res)
    ref = _load_ref_module("rouge/rouge.py", "ref_rouge")
    score, per = ref.Rouge().compute_score(gts, res)
    assert math.isclose(ours, float(score), rel_tol=1e-12)
    for a, b in zip(ours_per, per):
        assert math.isclose(a, float(b), rel_tol=1e-12)


def test_meteor_substitute_properties():
    m = Meteor()
    # exact match, one chunk: fmean=1, penalty=gamma*(1/m)^beta -> near 1
    gts = {1: ["man in black shirt"]}
    res = {1: ["man in black shirt"]}
    score, per = m.compute_score(gts, res)
    assert 0.9 < score <= 1.0
    # disjoint tokens: 0
    assert m.compute_score({1: ["red car"]}, {1: ["blue dog"]})[0] == 0.0
    # more matched content scores higher; best-of-refs is taken
    s_close = m.compute_score({1: ["man in black", "a dog"]},
                              {1: ["man in black"]})[0]
    s_far = m.compute_score({1: ["man in black", "a dog"]},
                            {1: ["black man"]})[0]
    assert s_close > s_far > 0.0


def test_ptb_tokenizer_punctuation_and_case():
    assert ptb_tokenize_sentence("The man, on the LEFT.") == \
        "the man on the left"
    assert ptb_tokenize_sentence("woman (in red)") == "woman in red"
    # possessive/contraction splitting keeps the word stems
    assert ptb_tokenize_sentence("man's hat isn't blue") == \
        "man 's hat is n't blue"
    tok = PTBTokenizer()
    out = tok.tokenize({7: ["Left Guy!", "guy; left"]})
    assert out == {7: ["left guy", "guy left"]}


def test_ref_eval_demo_cli(tmp_path):
    """scripts/ref_eval_demo.py over a synthetic REFER dataset."""
    import pickle
    import subprocess
    import sys

    base = tmp_path / "refcoco"
    base.mkdir()
    refs = [{"ref_id": 1, "ann_id": 10, "image_id": 100, "category_id": 1,
             "split": "val",
             "sentences": [{"sent_id": 0, "sent": "the red ball",
                            "raw": "the red ball",
                            "tokens": ["the", "red", "ball"]}],
             "sent_ids": [0]},
            {"ref_id": 2, "ann_id": 11, "image_id": 100, "category_id": 2,
             "split": "val",
             "sentences": [{"sent_id": 1, "sent": "a dog", "raw": "a dog",
                            "tokens": ["a", "dog"]}],
             "sent_ids": [1]}]
    with open(base / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)
    instances = {
        "annotations": [{"id": 10, "image_id": 100, "category_id": 1,
                         "bbox": [2, 2, 4, 4], "segmentation": [], "area": 16},
                        {"id": 11, "image_id": 100, "category_id": 2,
                         "bbox": [0, 0, 3, 3], "segmentation": [], "area": 9}],
        "images": [{"id": 100, "height": 12, "width": 12}],
        "categories": [{"id": 1, "name": "ball"}, {"id": 2, "name": "dog"}],
    }
    json.dump(instances, open(base / "instances.json", "w"))
    preds = {"predictions": [{"ref_id": 1, "sent": "the red ball"},
                             {"ref_id": 2, "sent": "a cat"},
                             {"ref_id": 99, "sent": "unknown"}]}
    pred_file = tmp_path / "preds.json"
    json.dump(preds, open(pred_file, "w"))
    dump = tmp_path / "scores.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "scripts/ref_eval_demo.py",
         "--data_root", str(tmp_path), "--predictions", str(pred_file),
         "--dump", str(dump)],
        capture_output=True, text=True, cwd=repo, env=env)
    assert out.returncode == 0, out.stderr
    assert "CIDEr:" in out.stdout and "Bleu_4:" in out.stdout
    assert "1 predictions have no GT ref" in out.stdout
    scored = json.load(open(dump))
    assert {e["ref_id"] for e in scored["evalRefs"]} == {1, 2}


def test_ref_evaluation_end_to_end():
    """RefEvaluation over a stub REFER object: reference output schema
    (eval / refToEval / evalRefs) and sane values."""

    class StubRefer:
        Refs = {
            1: {"sentences": [{"sent": "man in black"},
                              {"sent": "guy wearing black shirt"}]},
            2: {"sentences": [{"sent": "red car on the left"}]},
        }

    res = [{"ref_id": 1, "sent": "man in black"},
           {"ref_id": 2, "sent": "blue truck"}]
    ev = RefEvaluation(StubRefer(), res)
    ev.evaluate()
    for metric in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                   "ROUGE_L", "CIDEr"):
        assert metric in ev.eval
    assert set(ev.refToEval) == {1, 2}
    # the exact-match ref scores strictly dominate the mismatched one
    assert ev.refToEval[1]["Bleu_1"] > ev.refToEval[2]["Bleu_1"]
    assert ev.refToEval[1]["ROUGE_L"] > ev.refToEval[2]["ROUGE_L"]
    assert len(ev.evalRefs) == 2
    assert {e["ref_id"] for e in ev.evalRefs} == {1, 2}
