"""Golden numeric tests: every loss vs the reference's torch semantics.

Each criterion in volta_tpu.losses is checked to 1e-6 against an oracle
built from torch's own loss primitives with the reference's exact reduction
conventions (reference: volta/losses.py:16-126 and
volta/encoders.py:1080-1109):

* kl_1601    — KLDivLoss(none) with 0*log(0)=0, masked-POSITION denominator
* mse_2048   — MSELoss(none), masked-ELEMENT denominator
* huber_2048 — SmoothL1Loss(none), masked-ELEMENT denominator
* xent_1600/400 — CE(none) x confidence, masked-POSITION denominator
* xent_1601  — CE(none), masked-POSITION denominator
* nce_2048   — positive-vs-128-negatives CE over masked rows (negative
  indices injected so both sides score identical samples)
* MLM / ITM  — CrossEntropyLoss(ignore_index=-1)
* BCEWithLogitLoss — torch.nn.functional oracle

The denominators are exactly where silent mismatches hide (masked-element
vs masked-position, the max(.,1) guard), so zero-mask edge cases are
asserted too.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from volta_tpu import losses as L


def _fix(seed=0, b=3, r=5):
    rng = np.random.RandomState(seed)
    label = np.full((b, r), -1, np.int64)
    # mix of masked (1) and unmasked (-1/0) positions
    label[0, 1] = 1
    label[0, 3] = 1
    label[1, 0] = 1
    label[2, 2] = 0
    image_cls = rng.rand(b, r, 1601).astype(np.float32)
    image_cls /= image_cls.sum(-1, keepdims=True)
    # make some target entries exactly zero to exercise 0*log(0)
    image_cls[0, 1, :50] = 0.0
    image_cls[0, 1] /= image_cls[0, 1].sum()
    return dict(
        b=b, r=r, label=label,
        image_cls=image_cls,
        image_feat=rng.randn(b, r, 16).astype(np.float32),
        obj_labels=rng.randint(0, 1600, (b, r)).astype(np.int64),
        obj_confs=rng.rand(b, r).astype(np.float32),
        attr_labels=rng.randint(0, 400, (b, r)).astype(np.int64),
        attr_confs=rng.rand(b, r).astype(np.float32),
    )


def _mask_pos_denom(label):
    return max(int((label == 1).sum()), 1)


def test_kl_1601_golden():
    f = _fix()
    pred = np.random.RandomState(1).randn(f["b"], f["r"], 1601).astype(
        np.float32)
    logp = TF.log_softmax(torch.from_numpy(pred), dim=2)
    elem = TF.kl_div(logp, torch.from_numpy(f["image_cls"]),
                     reduction="none")
    m = torch.from_numpy((f["label"] == 1).astype(np.float32)).unsqueeze(2)
    want = 2.0 * float((elem * m).sum()) / _mask_pos_denom(f["label"])
    got = float(L.kl_1601(jnp.asarray(pred), 2.0, jnp.asarray(f["label"]),
                          image_cls=jnp.asarray(f["image_cls"])))
    assert got == pytest.approx(want, abs=1e-6)


@pytest.mark.parametrize("name,torch_elem", [
    ("mse_2048", lambda p, t: TF.mse_loss(p, t, reduction="none")),
    ("huber_2048", lambda p, t: TF.smooth_l1_loss(p, t, reduction="none")),
])
def test_feature_regression_golden(name, torch_elem):
    f = _fix()
    pred = np.random.RandomState(2).randn(*f["image_feat"].shape).astype(
        np.float32)
    elem = torch_elem(torch.from_numpy(pred),
                      torch.from_numpy(f["image_feat"]))
    m = torch.from_numpy(
        (f["label"] == 1).astype(np.float32)).unsqueeze(2).expand_as(elem)
    want = 0.5 * float((elem * m).sum()) / max(int(m.sum()), 1)
    got = float(getattr(L, name)(
        jnp.asarray(pred), 0.5, jnp.asarray(f["label"]),
        image_feat=jnp.asarray(f["image_feat"])))
    assert got == pytest.approx(want, abs=1e-6)


@pytest.mark.parametrize("name,ncls,conf", [
    ("xent_1600", 1600, True),
    ("xent_400", 400, True),
    ("xent_1601", 1601, False),
])
def test_xent_golden(name, ncls, conf):
    f = _fix()
    pred = np.random.RandomState(3).randn(f["b"], f["r"], ncls).astype(
        np.float32)
    tkey = {"xent_1600": "obj_labels", "xent_1601": "obj_labels",
            "xent_400": "attr_labels"}[name]
    ckey = "obj_confs" if "160" in name else "attr_confs"
    nll = TF.cross_entropy(torch.from_numpy(pred).reshape(-1, ncls),
                           torch.from_numpy(f[tkey]).view(-1),
                           reduction="none")
    if conf:
        nll = nll * torch.from_numpy(f[ckey]).view(-1)
    m = torch.from_numpy((f["label"].reshape(-1) == 1).astype(np.float32))
    want = 1.5 * float((nll * m).sum()) / _mask_pos_denom(f["label"])
    kwargs = {tkey: jnp.asarray(f[tkey])}
    if conf:
        kwargs[ckey] = jnp.asarray(f[ckey])
    got = float(getattr(L, name)(jnp.asarray(pred), 1.5,
                                 jnp.asarray(f["label"]), **kwargs))
    assert got == pytest.approx(want, abs=1e-6)


def test_nce_2048_golden():
    """Same negative indices on both sides: the dense masked-mean must equal
    the reference's gather-masked-rows-then-CE-mean
    (reference: volta/losses.py:36-83)."""
    f = _fix(b=4, r=6)
    b, r, d = f["image_feat"].shape
    n_neg = 8
    rng = np.random.RandomState(4)
    pred = rng.randn(b, r, d).astype(np.float32)
    # reference-style sampling: rows in [0, b-2] remapped off the diagonal,
    # inside-batch cols in [0, r-2] remapped off the own column
    row = rng.randint(0, b - 1, (b, r, 5))
    row = np.where(row == np.arange(b)[:, None, None], b - 1, row)
    col = rng.randint(0, r, (b, r, 5))
    across = row * r + col
    coli = rng.randint(0, r - 1, (b, r, 3))
    coli = np.where(coli == np.arange(r)[None, :, None], r - 1, coli)
    inside = np.arange(b)[:, None, None] * r + coli
    neg_idx = np.concatenate([across, inside], -1).astype(np.int64)

    # torch oracle
    tfeat = torch.from_numpy(f["image_feat"])
    tpred = torch.from_numpy(pred)
    lbl = torch.from_numpy(f["label"]) == 1
    predict_v = tpred[lbl]
    neg_v = tfeat.view(b * r, d)[torch.from_numpy(neg_idx)[lbl]]
    pos_v = tfeat[lbl]
    sample = torch.cat([pos_v.unsqueeze(1), neg_v], dim=1)
    score = torch.bmm(sample, predict_v.unsqueeze(2)).squeeze(2)
    want = 0.7 * float(TF.cross_entropy(
        score, torch.zeros(score.size(0), dtype=torch.long)))

    got = float(L.nce_2048(jnp.asarray(pred), 0.7, jnp.asarray(f["label"]),
                           image_feat=jnp.asarray(f["image_feat"]),
                           neg_idx=jnp.asarray(neg_idx)))
    assert got == pytest.approx(want, abs=1e-6)


def test_nce_2048_chunked_matches_dense():
    """The blockwise score scan (used when the dense [b,r,b*r] score matrix
    would crowd the HBM-resident feature store) must be bit-compatible with
    the dense all-pairs path — both with injected and with sampled
    negatives."""
    f = _fix(b=4, r=6)
    b, r, d = f["image_feat"].shape
    rng = np.random.RandomState(7)
    pred = rng.randn(b, r, d).astype(np.float32)
    neg_idx = rng.randint(0, b * r, (b, r, 8)).astype(np.int64)

    kw = dict(image_feat=jnp.asarray(f["image_feat"]),
              neg_idx=jnp.asarray(neg_idx))
    dense = float(L.nce_2048(jnp.asarray(pred), 0.7,
                             jnp.asarray(f["label"]), score_chunk=0, **kw))
    for chunk in (5, 8, 64):  # non-divisor, divisor, > b*r
        got = float(L.nce_2048(jnp.asarray(pred), 0.7,
                               jnp.asarray(f["label"]), score_chunk=chunk,
                               **kw))
        assert got == pytest.approx(dense, abs=1e-6), chunk
    # sampled negatives: same rng must give the same loss either way
    key = jax.random.PRNGKey(3)
    dense_s = float(L.nce_2048(jnp.asarray(pred), 0.7,
                               jnp.asarray(f["label"]), score_chunk=0,
                               image_feat=jnp.asarray(f["image_feat"]),
                               rng=key))
    chunk_s = float(L.nce_2048(jnp.asarray(pred), 0.7,
                               jnp.asarray(f["label"]), score_chunk=7,
                               image_feat=jnp.asarray(f["image_feat"]),
                               rng=key))
    assert chunk_s == pytest.approx(dense_s, abs=1e-6)


def test_mlm_itm_cross_entropy_ignore_golden():
    rng = np.random.RandomState(5)
    logits = rng.randn(4, 7, 31).astype(np.float32)
    labels = rng.randint(0, 31, (4, 7)).astype(np.int64)
    labels[labels % 3 == 0] = -1
    want = float(TF.cross_entropy(
        torch.from_numpy(logits).reshape(-1, 31),
        torch.from_numpy(labels).view(-1), ignore_index=-1))
    got = float(L.cross_entropy_ignore(jnp.asarray(logits),
                                       jnp.asarray(labels)))
    assert got == pytest.approx(want, abs=1e-6)

    itm_logits = rng.randn(6, 2).astype(np.float32)
    itm_labels = np.array([0, 1, 1, 0, 1, 0], np.int64)
    want = float(TF.cross_entropy(torch.from_numpy(itm_logits),
                                  torch.from_numpy(itm_labels),
                                  ignore_index=-1))
    got = float(L.cross_entropy_ignore(jnp.asarray(itm_logits),
                                       jnp.asarray(itm_labels)))
    assert got == pytest.approx(want, abs=1e-6)


def test_bce_with_logits_golden():
    rng = np.random.RandomState(6)
    logits = rng.randn(5, 9).astype(np.float32) * 4
    target = (rng.rand(5, 9) > 0.5).astype(np.float32)
    want = float(TF.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(target)))
    got = float(L.binary_cross_entropy_with_logits(
        jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(want, abs=1e-6)


def test_zero_mask_denominator_guard():
    """No masked regions: every criterion must return exactly 0 (the
    reference's max(sum,1) guard prevents 0/0)."""
    f = _fix()
    label = np.full_like(f["label"], -1)
    pred = np.zeros((f["b"], f["r"], 1601), np.float32)
    assert float(L.kl_1601(jnp.asarray(pred), 1.0, jnp.asarray(label),
                           image_cls=jnp.asarray(f["image_cls"]))) == 0.0
    predf = np.ones_like(f["image_feat"])
    assert float(L.mse_2048(jnp.asarray(predf), 1.0, jnp.asarray(label),
                            image_feat=jnp.asarray(f["image_feat"]))) == 0.0
    assert float(L.xent_1601(
        jnp.asarray(pred), 1.0, jnp.asarray(label),
        obj_labels=jnp.asarray(f["obj_labels"]))) == 0.0


def test_kl_zero_target_convention():
    """Exact-zero soft-target entries contribute 0 (torch xlogy semantics),
    not NaN."""
    pred = np.zeros((1, 2, 4), np.float32)
    cls = np.array([[[0.0, 0.0, 0.5, 0.5], [1.0, 0.0, 0.0, 0.0]]],
                   np.float32)
    label = np.array([[1, 1]], np.int64)
    logp = TF.log_softmax(torch.from_numpy(pred), dim=2)
    want = float(TF.kl_div(logp, torch.from_numpy(cls),
                           reduction="none").sum()) / 2
    got = float(L.kl_1601(jnp.asarray(pred), 1.0, jnp.asarray(label),
                          image_cls=jnp.asarray(cls)))
    assert np.isfinite(got)
    assert got == pytest.approx(want, abs=1e-6)


def test_nce_2048_bf16_paths_agree():
    """bf16 inputs (the production feature-store dtype): the dense path's
    bf16 score tensor and the blockwise scan's per-chunk rounding must
    stay bit-compatible (round-5 contract in losses._chunked_neg_scores),
    and the bf16 loss must sit near the f32 one."""
    f = _fix(b=4, r=6)
    b, r, d = f["image_feat"].shape
    rng = np.random.RandomState(11)
    pred = rng.randn(b, r, d).astype(np.float32)
    neg_idx = rng.randint(0, b * r, (b, r, 8)).astype(np.int64)

    feat16 = jnp.asarray(f["image_feat"], jnp.bfloat16)
    pred16 = jnp.asarray(pred, jnp.bfloat16)
    kw = dict(image_feat=feat16, neg_idx=jnp.asarray(neg_idx))
    dense16 = float(L.nce_2048(pred16, 0.7, jnp.asarray(f["label"]),
                               score_chunk=0, **kw))
    for chunk in (5, 8, 64):
        got = float(L.nce_2048(pred16, 0.7, jnp.asarray(f["label"]),
                               score_chunk=chunk, **kw))
        assert got == pytest.approx(dense16, abs=1e-6), chunk
    # mixed f32 pred x bf16 feat promotes to the f32 matmul (no silent
    # downcast of full-precision predictions — review contract)
    mixed = float(L.nce_2048(jnp.asarray(pred), 0.7,
                             jnp.asarray(f["label"]), score_chunk=0,
                             image_feat=feat16,
                             neg_idx=jnp.asarray(neg_idx)))
    dense32 = float(L.nce_2048(jnp.asarray(pred), 0.7,
                               jnp.asarray(f["label"]), score_chunk=0,
                               image_feat=jnp.asarray(f["image_feat"]),
                               neg_idx=jnp.asarray(neg_idx)))
    assert dense16 == pytest.approx(dense32, rel=0.05)
    assert mixed == pytest.approx(dense32, rel=0.02)


def test_nce_shared_negatives_mode():
    """Opt-in shared-cross-batch-negative NCE (losses._nce_shared): same
    score layout (1 positive + 127 negatives), finite loss near the
    per-query-sampled one, deterministic per rng, and in-batch columns
    never hit the query's own region."""
    f = _fix(b=4, r=6)
    b, r, d = f["image_feat"].shape
    rng = np.random.RandomState(13)
    pred = jnp.asarray(rng.randn(b, r, d).astype(np.float32))
    feat = jnp.asarray(f["image_feat"])
    lbl = jnp.asarray(f["label"])
    key = jax.random.PRNGKey(5)

    L._NCE_SHARED_NEGATIVES[0] = True
    try:
        shared = float(L.nce_2048(pred, 0.7, lbl, image_feat=feat, rng=key))
        shared2 = float(L.nce_2048(pred, 0.7, lbl, image_feat=feat,
                                   rng=key))
        other = float(L.nce_2048(pred, 0.7, lbl, image_feat=feat,
                                 rng=jax.random.PRNGKey(9)))
    finally:
        L._NCE_SHARED_NEGATIVES[0] = False
    sampled = float(L.nce_2048(pred, 0.7, lbl, image_feat=feat, rng=key))
    assert np.isfinite(shared)
    assert shared == shared2          # deterministic per rng
    assert shared != other            # rng actually drives the draw
    # same objective scale: both are CE over 1-of-128 with the same
    # marginal negative distribution
    assert shared == pytest.approx(sampled, rel=0.25)

    # the in-batch column remap never selects the query's own region
    k1, k3 = jax.random.split(key, 2)
    col = jax.random.randint(k3, (b, r, int(128 * 0.3)), 0, r - 1)
    own = jnp.arange(r)[None, :, None]
    col = jnp.where(col == own, r - 1, col)
    assert not bool(jnp.any(col == own))
