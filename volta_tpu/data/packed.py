"""Packed in-memory feature store: decode the LMDB once, gather per batch.

The per-sample decode path (pickle + base64 + reshape per image,
features_reader.py) costs ~6.5 ms/sample on a slow host core — far short of
the ~2.8k samples/s the TPU step consumes. Packing every image into
contiguous [n, R, D] arrays once (optionally disk-cached as ``.npy``
memmaps) turns batch assembly into a single numpy fancy-index gather
(~43 ms per 256-batch), the host-side analogue of the reference's
``in_memory`` reader cache (reference:
volta/datasets/_image_features_reader.py:46-60) scaled to full-epoch rates.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Sequence

import numpy as np


class PackedFeatures:
    """Contiguous padded region features for a set of image ids.

    feat [n, R, D] float32, loc [n, R, num_locs] float32, mask [n, R] int32;
    ``row(image_id)`` maps ids to rows.
    """

    def __init__(self, feat, loc, mask, index: Dict):
        self.feat = feat
        self.loc = loc
        self.mask = mask
        self._index = index

    def row(self, image_id) -> int:
        try:
            return self._index[image_id]
        except KeyError:
            return self._index[str(image_id)]

    def rows(self, image_ids) -> np.ndarray:
        return np.fromiter((self.row(i) for i in image_ids), np.int64,
                           len(image_ids))


def _cache_dir(lmdb_path: str, tag: str) -> str:
    h = hashlib.sha1(tag.encode()).hexdigest()[:10]
    return lmdb_path + f".packed-{h}"


def feature_dtype(name):
    """'bfloat16' halves the per-batch gather bytes; numerics are identical
    to the bf16-compute train step (the device would cast anyway)."""
    if name in (None, "float32", np.float32):
        return np.float32
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16) if str(name) == "bfloat16" \
        else np.dtype(name)


def pack_features(reader, image_ids: Sequence, max_regions: int,
                  num_locs: int, cache: bool = True,
                  dtype="float32") -> PackedFeatures:
    """Decode ``image_ids`` through ``reader`` into packed arrays, memoised
    on disk next to the LMDB (keyed by shape config + id set + dtype)."""
    ids = list(image_ids)
    D = reader.feature_size
    dt = feature_dtype(dtype)
    tag = f"v1:{max_regions}:{num_locs}:{D}:{reader.add_global_imgfeat}:" \
          f"{len(ids)}:{ids[0]}:{ids[-1]}:{np.dtype(dt).name}"
    cdir = _cache_dir(getattr(reader.env, "path", "features"), tag)
    index = {iid: i for i, iid in enumerate(ids)}
    index.update({str(iid): i for i, iid in enumerate(ids)})
    if cache and os.path.isdir(cdir):
        # full RAM load: random 4KB-page faults through a memmap are an
        # order of magnitude slower per batch than in-memory fancy gathers
        try:
            return PackedFeatures(
                _load(os.path.join(cdir, "feat.npy"), dt),
                np.load(os.path.join(cdir, "loc.npy")),
                np.load(os.path.join(cdir, "mask.npy")),
                index)
        except OSError:
            pass

    n = len(ids)
    feat = np.zeros((n, max_regions, D), dt)
    loc = np.zeros((n, max_regions, num_locs), np.float32)
    mask = np.zeros((n, max_regions), np.int32)
    for i, iid in enumerate(ids):
        feats, num_boxes, boxes, _ = reader[iid]
        k = min(int(num_boxes), max_regions)
        feat[i, :k] = feats[:k].astype(dt)
        loc[i, :k] = boxes[:k]
        mask[i, :k] = 1
    if cache:
        try:
            os.makedirs(cdir, exist_ok=True)
            _save(os.path.join(cdir, "feat.npy"), feat)
            np.save(os.path.join(cdir, "loc.npy"), loc)
            np.save(os.path.join(cdir, "mask.npy"), mask)
        except OSError:
            pass
    return PackedFeatures(feat, loc, mask, index)


def _is_ml_dtype(dt):
    return np.dtype(dt).kind == "V" or np.dtype(dt).name == "bfloat16"


def _save(path, arr):
    """np.save with ml_dtypes support (bf16 rides as a uint16 view)."""
    if _is_ml_dtype(arr.dtype):
        np.save(path, arr.view(np.uint16))
    else:
        np.save(path, arr)


def _load(path, dt):
    arr = np.load(path)
    return arr.view(dt) if _is_ml_dtype(dt) else arr


def pack_token_rows(rows: Sequence[np.ndarray]) -> np.ndarray:
    """Stack equal-length token arrays (already padded) to one matrix."""
    return np.stack([np.asarray(r, np.int32) for r in rows])


def scatter_targets(labels_flat, scores_flat, counts, idx, num_labels):
    """Batch soft-target scatter (reference: vqa_dataset.py:273-281).

    labels/scores are the concatenated per-entry lists with ``counts`` per
    entry; entry offsets are derived once by the caller via cumsum.
    """
    counts = np.asarray(counts)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    b = len(idx)
    target = np.zeros((b, num_labels), np.float32)
    sel = np.concatenate(
        [np.arange(offsets[i], offsets[i] + counts[i]) for i in idx]) \
        if b else np.zeros((0,), np.int64)
    rows = np.repeat(np.arange(b), counts[idx])
    target[rows, labels_flat[sel]] = scores_flat[sel]
    return target
