"""Pretraining and fine-tuning losses, re-expressed functionally.

reference: volta/losses.py (the 7 masked-region objectives) and
volta/encoders.py:1080-1109 (MLM / ITM). In-place index tricks become
masked reductions over statically shaped arrays; the NCE negative sampling
uses jax PRNG instead of torch's in-place ``random_``.

Conventions: ``image_label`` is 1 for masked regions, -1/0 elsewhere
(the global image feature row has already been stripped by the caller, as in
reference: volta/encoders.py:1082-1085).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# target dims per objective id (reference: volta/losses.py:129-137)
PRE_VIS_TARGETS = {
    "0": 1601, "1": 2048, "2": 2048, "3": 1600, "4": 400, "5": 2048, "6": 1601,
}


def cross_entropy_ignore(logits, labels, ignore_index: int = -1):
    """Mean CE over positions whose label != ignore_index
    (reference: volta/encoders.py:1030 CrossEntropyLoss(ignore_index=-1))."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def binary_cross_entropy_with_logits(logits, targets, reduction="mean"):
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if reduction == "mean":
        return jnp.mean(per)
    if reduction == "sum":
        return jnp.sum(per)
    return per


def _masked_mean_positions(loss_per_region, label):
    """sum(loss * [label==1]) / max(#masked, 1) (KLD/xent normalisation)."""
    m = (label == 1).astype(jnp.float32)
    return jnp.sum(loss_per_region * m) / jnp.maximum(jnp.sum(m), 1.0)


def _masked_mean_elements(loss_elem, label):
    """Per-element masked mean: denominator counts masked *elements*
    (reference: volta/losses.py:30-31 expands the mask to the loss shape)."""
    m = (label == 1).astype(jnp.float32)[..., None]
    m = jnp.broadcast_to(m, loss_elem.shape)
    return jnp.sum(loss_elem * m) / jnp.maximum(jnp.sum(m), 1.0)


def kl_1601(pred, weight, label, image_cls=None, image_feat=None,
            obj_labels=None, obj_confs=None, attr_labels=None,
            attr_confs=None, rng=None):
    """KLD vs soft Faster-R-CNN class distribution — the CTRL default
    (reference: volta/losses.py:16-22)."""
    if image_cls is None:
        return 0.0
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    tgt = image_cls.astype(jnp.float32)
    # KLDivLoss(reduction=none): tgt * (log tgt - logp); define 0 log 0 = 0
    elem = tgt * (jnp.where(tgt > 0, jnp.log(jnp.maximum(tgt, 1e-30)), 0.0)
                  - logp)
    per_region = jnp.sum(elem, axis=-1)
    return weight * _masked_mean_positions(per_region, label)


def mse_2048(pred, weight, label, image_cls=None, image_feat=None,
             obj_labels=None, obj_confs=None, attr_labels=None,
             attr_confs=None, rng=None):
    """Feature regression (reference: volta/losses.py:25-33)."""
    if image_feat is None:
        return 0.0
    elem = jnp.square(pred.astype(jnp.float32)
                      - image_feat.astype(jnp.float32))
    return weight * _masked_mean_elements(elem, label)


def huber_2048(pred, weight, label, image_cls=None, image_feat=None,
               obj_labels=None, obj_confs=None, attr_labels=None,
               attr_confs=None, rng=None):
    """SmoothL1 feature regression (reference: volta/losses.py:108-116)."""
    if image_feat is None:
        return 0.0
    d = pred.astype(jnp.float32) - image_feat.astype(jnp.float32)
    ad = jnp.abs(d)
    elem = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
    return weight * _masked_mean_elements(elem, label)


def _xent_conf(pred, weight, label, targets, confs, num_classes):
    logits = pred.astype(jnp.float32).reshape(-1, num_classes)
    t = targets.reshape(-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.clip(t, 0, num_classes - 1)[:, None], axis=-1)[:, 0]
    if confs is not None:
        nll = nll * confs.reshape(-1).astype(jnp.float32)
    m = (label.reshape(-1) == 1).astype(jnp.float32)
    return weight * jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def xent_1600(pred, weight, label, image_cls=None, image_feat=None,
              obj_labels=None, obj_confs=None, attr_labels=None,
              attr_confs=None, rng=None):
    """Hard object labels x detector confidence
    (reference: volta/losses.py:86-94)."""
    if obj_labels is None or obj_confs is None:
        return 0.0
    return _xent_conf(pred, weight, label, obj_labels, obj_confs, 1600)


def xent_400(pred, weight, label, image_cls=None, image_feat=None,
             obj_labels=None, obj_confs=None, attr_labels=None,
             attr_confs=None, rng=None):
    """Hard attribute labels x confidence (reference: volta/losses.py:97-105)."""
    if attr_labels is None or attr_confs is None:
        return 0.0
    return _xent_conf(pred, weight, label, attr_labels, attr_confs, 400)


def xent_1601(pred, weight, label, image_cls=None, image_feat=None,
              obj_labels=None, obj_confs=None, attr_labels=None,
              attr_confs=None, rng=None):
    """Hard object labels, no confidence (reference: volta/losses.py:119-126)."""
    if obj_labels is None:
        return 0.0
    return _xent_conf(pred, weight, label, obj_labels, None, 1601)


def _chunked_neg_scores(predf, flat, neg_idx, chunk: int):
    """Blockwise all-pairs candidate scoring: scan over column blocks of
    the [b*r] candidate axis, keeping only the sampled scalar scores. Peak
    extra memory is one [b, r, chunk] block instead of the full
    [b, r, b*r] score matrix (1.36 GB at b512 r36) — this is what lets NCE
    pretraining coexist with the HBM-resident CC feature store. Numerics
    are identical to the dense path (same fp32 dot products; equality
    tested)."""
    m, d = flat.shape
    pad = (-m) % chunk
    flat_p = jnp.pad(flat, ((0, pad), (0, 0)))
    nchunks = (m + pad) // chunk
    blocks = flat_p.reshape(nchunks, chunk, d)

    def body(acc, args):
        c, block = args
        s = jnp.einsum("brd,md->brm", predf, block,
                       preferred_element_type=jnp.float32)
        if _NCE_SCORE_DTYPE_FOLLOWS_INPUT[0] \
                and predf.dtype != jnp.float32:
            # same rounding as the dense path's bf16 score tensor, so the
            # two paths stay numerically identical per the contract above
            s = s.astype(predf.dtype)
        off = neg_idx - c * chunk
        valid = (off >= 0) & (off < chunk)
        got = jnp.take_along_axis(
            s, jnp.clip(off, 0, chunk - 1), axis=-1).astype(jnp.float32)
        return acc + jnp.where(valid, got, 0.0), None

    init = jnp.zeros(neg_idx.shape, jnp.float32)
    acc, _ = jax.lax.scan(body, init,
                          (jnp.arange(nchunks), blocks))
    return acc


# dense all-pairs score matrices beyond this many bytes switch to the
# chunked scan. b512 r36 is 1.36 GB dense — measured 2x faster than the
# scan (362 vs 615 ms/step) and it fits HBM once the CC store is pruned
# per objective, so the dense path covers the reference's shapes and the
# scan only guards genuinely larger batches.
_NCE_DENSE_SCORE_BYTES = 1536 * 2**20
_NCE_CHUNK = 4096
# bf16 inputs -> bf16 score tensor (see nce_2048); [False] forces f32
# scores for A/B (tools/bench_pretrain.py --nce_score_f32)
_NCE_SCORE_DTYPE_FOLLOWS_INPUT = [True]
# Opt-in TPU-native NCE negative scheme (--nce_shared_negatives on the
# pretraining CLI / bench): one SHARED set of 89 cross-batch candidate
# rows per step instead of 89 per-query draws, plus the reference's 38
# per-query in-batch draws gathered from the small [b, r, r] in-image
# score tensor. This removes the [b*r, b*r] all-pairs matmul (1.47 TFLOP/
# step at reference shapes) and the 2.4M-element gather/scatter on its
# 1.4 GB output — the two costs the round-5 trace shows as the whole NCE
# deficit (analysis: logs/trace_cc_nce_r5*_analysis.log; byte-halving the
# score tensor measured flat, so the gather is per-index-bound and only a
# structural change removes it). Sampling-distribution caveat: each
# negative's marginal distribution is unchanged (uniform over the batch),
# but cross-batch negatives are shared across queries within a step
# (standard practice in large-scale contrastive training, e.g.
# in-batch-negative schemes) and a query's own row is not excluded
# (~0.5% collision at b512 r37) — NOT bit-parity with the reference's
# per-query sampling, hence opt-in.
_NCE_SHARED_NEGATIVES = [False]


def _nce_shared(pred, weight, label, image_feat, rng, num_negative):
    """Shared-cross-batch-negative NCE (see _NCE_SHARED_NEGATIVES)."""
    b, r, d = image_feat.shape
    n_across = int(num_negative * 0.7)
    n_inside = int(num_negative * 0.3)
    score_dtype = jnp.promote_types(pred.dtype, image_feat.dtype)
    predf = pred.astype(score_dtype)
    feat = image_feat.astype(score_dtype)
    flat = feat.reshape(b * r, d)

    k1, k3 = jax.random.split(rng, 2)
    idx_shared = jax.random.randint(k1, (n_across,), 0, b * r)
    cross = jnp.einsum("brd,nd->brn", predf,
                       jnp.take(flat, idx_shared, axis=0),
                       preferred_element_type=jnp.float32)
    # in-batch: per-query draws from the OWN image's [r, r] score block
    # (small batched matmul + gather from a VMEM-sized tensor)
    in_scores = jnp.einsum("brd,bsd->brs", predf, feat,
                           preferred_element_type=jnp.float32)
    col_inside = jax.random.randint(k3, (b, r, n_inside), 0, r - 1)
    own_col = jnp.arange(r)[None, :, None]
    col_inside = jnp.where(col_inside == own_col, r - 1, col_inside)
    inside = jnp.take_along_axis(in_scores, col_inside, axis=-1)

    pos = jnp.einsum("brd,brd->br", predf, feat,
                     preferred_element_type=jnp.float32)
    scores = jnp.concatenate([pos[..., None], cross, inside], axis=-1)
    logp = jax.nn.log_softmax(scores, axis=-1)
    nll = -logp[..., 0]
    return weight * _masked_mean_positions(nll, label)


def nce_2048(pred, weight, label, image_cls=None, image_feat=None,
             obj_labels=None, obj_confs=None, attr_labels=None,
             attr_confs=None, rng=None, num_negative: int = 128,
             neg_idx=None, score_chunk=None):
    """Contrastive feature prediction with 128 negatives, 70% cross-batch /
    30% in-batch (reference: volta/losses.py:36-83).

    Computed densely over all regions with the masked-position mean taken at
    the end (XLA-friendly; reference gathers masked rows first — identical
    expectation). ``neg_idx`` [b, r, num_negative] overrides the sampled
    flat negative indices (used by the golden numerics tests).
    """
    if image_feat is None:
        return 0.0
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b, r, d = image_feat.shape
    if neg_idx is None and _NCE_SHARED_NEGATIVES[0]:
        return _nce_shared(pred, weight, label, image_feat, rng,
                           num_negative)
    if neg_idx is None:
        n_across = int(num_negative * 0.7)
        n_inside = int(num_negative * 0.3)

        k1, k2, k3 = jax.random.split(rng, 3)
        # cross-batch: random rows != own row (remapped to b-1, reference
        # volta/losses.py:49-54)
        row_across = jax.random.randint(k1, (b, r, n_across), 0, b - 1)
        own = jnp.arange(b)[:, None, None]
        row_across = jnp.where(row_across == own, b - 1, row_across)
        col_across = jax.random.randint(k2, (b, r, n_across), 0, r)
        idx_across = row_across * r + col_across
        # in-batch: own row, random cols != own col
        col_inside = jax.random.randint(k3, (b, r, n_inside), 0, r - 1)
        own_col = jnp.arange(r)[None, :, None]
        col_inside = jnp.where(col_inside == own_col, r - 1, col_inside)
        idx_inside = own * r + col_inside
        neg_idx = jnp.concatenate([idx_across, idx_inside], axis=-1)
    # int truncation gives 89 + 38 = 127 actual negatives for the nominal
    # 128 (reference: volta/losses.py:43-44 does exactly the same)
    num_negative = neg_idx.shape[-1]

    # score every candidate with [b*r, d] x [d, b*r] matmuls (MXU-sized)
    # and gather the sampled scalar scores — materialising the gathered
    # negative *vectors* ([b, r, N, d] = 19 GB at reference shapes) blows
    # HBM, while all-pairs scores are only [b, r, b*r]. Large score
    # matrices (or an explicit score_chunk) go through the blockwise scan.
    # The matmuls run on the INPUTS' dtype with f32 accumulation
    # (preferred_element_type below): with the bf16 feature store the
    # all-pairs matmul rides the bf16 MXU rate — the old f32 upcast added
    # no information (inputs were bf16-quantized) but ran the 1.47-TFLOP
    # matmul at the f32 rate, ~24 ms/step of the round-4 NCE deficit
    # (logs/trace_cc_nce_r5_analysis.log). fp32 inputs (the golden tests'
    # torch-parity path) still take the f32 matmul: numerics unchanged.
    # promote, don't downcast: f32 anywhere (the parity/debug configs)
    # keeps the f32 matmul; only all-bf16 inputs take the bf16 MXU path
    score_dtype = jnp.promote_types(pred.dtype, image_feat.dtype)
    flat = image_feat.reshape(b * r, d).astype(score_dtype)
    predf = pred.astype(score_dtype)
    if score_chunk is None and b * r * b * r * 4 > _NCE_DENSE_SCORE_BYTES:
        score_chunk = _NCE_CHUNK
    if score_chunk:
        neg_scores = _chunked_neg_scores(predf, flat, neg_idx, score_chunk)
    else:
        all_scores = jnp.einsum("brd,md->brm", predf, flat,
                                preferred_element_type=jnp.float32)
        if _NCE_SCORE_DTYPE_FOLLOWS_INPUT[0] \
                and predf.dtype != jnp.float32:
            # sub-f32 inputs (the bf16 feature store): keep the [b, r,
            # b*r] score tensor in bf16 too — halves its HBM footprint
            # and the gather/scatter tile traffic that dominates the NCE
            # step's non-matmul overhead (35 fwd + 21 bwd ms/step in
            # logs/trace_cc_nce_r5_analysis.log). Only the 127 sampled
            # scalars are upcast for the softmax. f32 inputs keep f32
            # scores (torch-golden parity path untouched).
            all_scores = all_scores.astype(predf.dtype)
        neg_scores = jnp.take_along_axis(all_scores, neg_idx,
                                         axis=-1).astype(jnp.float32)
    pos_scores = jnp.einsum("brd,brd->br", predf, image_feat,
                            preferred_element_type=jnp.float32)
    scores = jnp.concatenate([pos_scores[..., None], neg_scores], axis=-1)
    logp = jax.nn.log_softmax(scores, axis=-1)
    nll = -logp[..., 0]  # positive is class 0
    return weight * _masked_mean_positions(nll, label)


PRE_VIS_CRITERIONS = {
    "0": kl_1601,
    "1": mse_2048,
    "2": nce_2048,
    "3": xent_1600,
    "4": xent_400,
    "5": huber_2048,
    "6": xent_1601,
}


def pretraining_losses(cfg, outputs: Dict, *, masked_lm_labels=None,
                       image_label=None, image_cls=None, image_feat=None,
                       obj_labels=None, obj_confs=None, attr_labels=None,
                       attr_confs=None, next_sentence_label=None, rng=None):
    """MLM + weighted masked-region + ITM losses
    (reference: volta/encoders.py:1080-1112).

    The caller passes region tensors already stripped of the global image
    feature row; ``outputs['mrm_logits']`` rows are stripped here per
    ``add_global_imgfeat``.
    """
    add = cfg.add_global_imgfeat
    img_loss = 0.0
    for ix, weight in cfg.visual_target_weights.items():
        if weight <= 0:
            continue
        scores = outputs["mrm_logits"][ix]
        scores = scores[:, :-1] if add == "last" else (
            scores[:, 1:] if add == "first" else scores)
        img_loss = img_loss + PRE_VIS_CRITERIONS[ix](
            scores, weight, image_label, image_cls, image_feat,
            obj_labels, obj_confs, attr_labels, attr_confs, rng=rng)

    mlm = cross_entropy_ignore(outputs["mlm_logits"], masked_lm_labels) \
        if masked_lm_labels is not None else 0.0
    itm = 0.0
    if outputs["itm_logits"] is not None and next_sentence_label is not None:
        itm = cross_entropy_ignore(outputs["itm_logits"], next_sentence_label)
    return mlm, img_loss, itm
