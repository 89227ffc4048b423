"""The notebook-replacement analysis CLIs (reference:
scripts/Retrieval_visualization.ipynb, scripts/refer_expression.ipynb)
run over our eval dump formats."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")


def run(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, env=ENV, timeout=120)


def test_retrieval_visualization(tmp_path):
    # 4 images x 2 captions: captions 0-5 rank gt first, 6-7 miss top-1
    res = [[i // 2] + [j for j in range(4) if j != i // 2]
           for i in range(6)]
    res += [[(i // 2 + 1) % 4, i // 2, 0, 1] for i in range(6, 8)]
    a = tmp_path / "test_result.json"
    a.write_text(json.dumps(res))
    caps = [f"caption number {i}" for i in range(8)]
    c = tmp_path / "captions.json"
    c.write_text(json.dumps(caps))

    r = run("retrieval_visualization.py", "--result", str(a),
            "--captions", str(c), "--captions_per_image", "2",
            "--topk", "1")
    assert r.returncode == 0, r.stderr
    assert "r1=75.00" in r.stdout
    assert "hits@1: 6, misses: 2" in r.stdout

    # comparing a perfect run against itself-with-misses
    perfect = [[i // 2] + [j for j in range(4) if j != i // 2]
               for i in range(8)]
    b = tmp_path / "perfect.json"
    b.write_text(json.dumps(perfect))
    r = run("retrieval_visualization.py", "--result", str(b),
            "--compare", str(a), "--captions_per_image", "2",
            "--topk", "1")
    assert r.returncode == 0, r.stderr
    assert "won@1 vs compare: 2, lost: 0" in r.stdout


def test_refer_expression_analysis(tmp_path):
    mk = lambda ious: [{"id": i, "target": 0, "IOU": v}  # noqa: E731
                       for i, v in enumerate(ious)]
    a = tmp_path / "a.json"
    a.write_text(json.dumps(mk([0.9, 0.8, 0.2, 0.7, 0.1, 0.6])))
    b = tmp_path / "b.json"
    b.write_text(json.dumps(mk([0.9, 0.1, 0.2, 0.1, 0.8, 0.6])))
    caps = [{"id": i, "caption": t} for i, t in enumerate(
        ["red ball", "red cube left", "blue thing", "red cube",
         "green sphere", "red ball right"])]
    c = tmp_path / "caps.json"
    c.write_text(json.dumps(caps))

    r = run("refer_expression_analysis.py", "--result", str(a),
            "--compare", str(b), "--captions", str(c))
    assert r.returncode == 0, r.stderr
    assert "acc@0.5 = 66.67" in r.stdout   # a: 4/6
    assert "acc@0.5 = 50.00" in r.stdout   # b: 3/6
    assert "won: 2, lost: 1" in r.stdout
    # ids 1,3 won and share the word "cube"
    assert "cube" in r.stdout.split("wins")[1].split("losses")[0]
