"""Sanity bounds for the analytic FLOP estimator (tools/flops_estimate.py).

Anchors: BERT-base text-only fwd ~= 2 * 110M params * L tokens is the
classic rule of thumb; ctrl_uniter at VQA shapes was independently
hand-estimated at ~10 GFLOP fwd/pair (BASELINE.md's 30.6 GFLOP/pair
train figure / 3). The estimator must reproduce that scale and order
the families correctly (dual-stream vilbert costs more than uniter:
extra vision-stream projections at v_hidden=1024).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from flops_estimate import forward_flops  # noqa: E402

from volta_tpu.config import VoltaConfig

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")


def _fwd(name):
    cfg = VoltaConfig.from_json_file(os.path.join(ROOT, name + ".json"))
    return forward_flops(cfg, lt=23, regions=36)


def test_uniter_scale_matches_hand_estimate():
    f = _fwd("ctrl_uniter_base")
    assert 9e9 < f < 12e9  # ~10.5 GFLOP fwd/pair at b=1


def test_family_ordering():
    uniter = _fwd("ctrl_uniter_base")
    vilbert = _fwd("ctrl_vilbert_base")
    lxmert = _fwd("ctrl_lxmert")
    visualbert = _fwd("ctrl_visualbert_base")
    assert vilbert > lxmert > uniter
    # visualbert shares uniter's single-stream plan and widths
    assert abs(visualbert - uniter) / uniter < 0.01


def test_scales_linearly_with_depth():
    cfg = VoltaConfig.from_json_file(
        os.path.join(ROOT, "ctrl_uniter_base.json"))
    base = forward_flops(cfg, lt=23, regions=36)
    longer = forward_flops(cfg, lt=46, regions=36)
    # more text tokens -> strictly more FLOPs, sublinear x2 (vision fixed)
    assert base < longer < 2 * base
