"""Conceptual Captions pretraining dataset: ITM / MLM / MRM masking.

reference: volta/datasets/concept_cap_dataset.py. The reference streams
tensorpack LMDB shards through a ZMQ worker pipeline with local-window
shuffling; here the same shards are *randomly accessible* through the native
LMDB reader, so a map-style dataset + the threaded loader gives true global
shuffling and per-host sharding without worker processes.

Record layout per image (13 fields, reference:
concept_cap_dataset.py:429-431): features [N,2048], cls_prob [N,1601],
obj_labels/confs, attr_labels/confs, attr_scores [N,401], boxes [N,4],
num_boxes, h, w, image_id, caption.

Masking semantics preserved exactly (reference:
concept_cap_dataset.py:506-668): 50% random-caption ITM negatives (skipped
for objective 2), 15% MLM with 80/10/10, 15% region masking zeroing the
feature 90% of the time and recording regions overlapping a masked one at
IoU > 0.4 in ``masked_label`` (used to exclude them from the global mean
feature).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from .. import lmdbx
from .. import serialization
from .refer_expression import boxes_iou


class ConceptCapDataset:
    def __init__(self, lmdb_path: str, caption_path: Optional[str],
                 tokenizer, seq_len: int = 36, region_len: int = 36,
                 split: str = "Train", visualization: bool = False,
                 objective: int = 0, num_locs: int = 5,
                 add_global_imgfeat: Optional[str] = None, seed: int = 0):
        self.env = lmdbx.Env(lmdb_path)
        keys = self.env.get(b"__keys__")
        if keys is not None:
            self.keys = serialization.loads(keys)
        else:
            self.keys = [k for k in self.env.keys() if k != b"__keys__"]
        self.tokenizer = tokenizer
        self.seq_len = seq_len
        self.region_len = region_len
        self.visualization = visualization
        self.objective = objective
        self.num_locs = num_locs
        self.add_global_imgfeat = add_global_imgfeat
        self.seed = seed
        self.epoch = 0
        if caption_path and os.path.exists(caption_path):
            self.captions = list(json.load(open(caption_path)).values())
        else:
            self.captions = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.keys)

    # ------------------------------------------------------------- masking
    def _random_cap(self, rng, caption):
        if self.visualization or self.objective == 2 or self.captions is None:
            return caption, 0
        if rng.rand() > 0.5:
            return self.captions[rng.randint(len(self.captions))], 1
        return caption, 0

    def _random_word(self, rng, tokens):
        labels = np.full((len(tokens),), -1, np.int64)
        out = list(tokens)
        for i, tok in enumerate(tokens):
            prob = rng.rand()
            if prob < 0.15 and not self.visualization:
                prob /= 0.15
                if prob < 0.8:
                    out[i] = self.tokenizer.mask_id
                elif prob < 0.9:
                    out[i] = int(rng.randint(len(self.tokenizer)))
                labels[i] = tok
        return out, labels

    def _random_region(self, rng, feats, num_boxes, overlaps):
        labels = np.full((self.region_len,), -1, np.int64)
        masked = np.zeros((num_boxes,), bool)
        for i in range(num_boxes):
            prob = rng.rand()
            if prob < 0.15 and not self.visualization:
                prob /= 0.15
                if prob < 0.9:
                    feats[i] = 0
                masked |= overlaps[i] > 0.4
                labels[i] = 1
        return feats, labels, masked

    # ------------------------------------------------------------- access
    def __getitem__(self, index):
        raw = self.env.get(self.keys[index] if isinstance(
            self.keys[index], bytes) else str(self.keys[index]).encode())
        rec = serialization.loads(raw)
        (feats_wp, cls_wp, obj_labels, obj_confs, attr_labels, attr_confs,
         attr_scores, boxes_wp, num_boxes, image_h, image_w, image_id,
         caption) = rec
        if isinstance(caption, bytes):
            caption = caption.decode("utf-8")
        num_boxes = int(num_boxes)
        rng = np.random.RandomState(
            (self.seed * 1_000_003 + self.epoch * 7919 + index) % (2**31))

        R = self.region_len
        image_feat = np.zeros((R, feats_wp.shape[-1]), np.float32)
        image_cls = np.zeros((R, 1601), np.float32)
        image_attrs = np.zeros((R, 401), np.float32)
        image_loc = np.zeros((R, self.num_locs), np.float32)
        image_feat[:num_boxes] = feats_wp
        image_cls[:num_boxes] = cls_wp
        image_attrs[:num_boxes] = attr_scores
        image_loc[:num_boxes, :4] = boxes_wp

        def pad_i64(x, fill=0):
            out = np.full((R,), fill, np.int64)
            out[:num_boxes] = np.asarray(x[:num_boxes]).reshape(-1)
            return out

        def pad_f32(x):
            out = np.zeros((R,), np.float32)
            out[:num_boxes] = np.asarray(x[:num_boxes]).reshape(-1)
            return out

        obj_labels = pad_i64(obj_labels)
        attr_labels = pad_i64(attr_labels)
        obj_confs = pad_f32(obj_confs)
        attr_confs = pad_f32(attr_confs)

        if self.num_locs == 5:
            image_loc[:, 4] = ((image_loc[:, 3] - image_loc[:, 1])
                               * (image_loc[:, 2] - image_loc[:, 0])
                               / (float(image_w) * float(image_h)))
        image_loc[:, [0, 2]] /= float(image_w)
        image_loc[:, [1, 3]] /= float(image_h)

        overlaps = np.asarray(
            boxes_iou(np.asarray(boxes_wp, np.float32),
                      np.asarray(boxes_wp, np.float32)))

        caption, is_match = self._random_cap(rng, caption)
        tokens = self.tokenizer.encode(caption, add_special_tokens=False)
        tokens = list(tokens)[: self.seq_len - 2]
        tokens, token_labels = self._random_word(rng, tokens)

        input_ids = [self.tokenizer.cls_id] + tokens + [self.tokenizer.sep_id]
        lm_labels = np.concatenate([[-1], token_labels, [-1]])
        pad = self.seq_len - len(input_ids)
        input_mask = np.array([1] * len(input_ids) + [0] * pad, np.int32)
        segment_ids = np.zeros((self.seq_len,), np.int32)
        input_ids = np.array(input_ids + [0] * pad, np.int32)
        lm_labels = np.concatenate([lm_labels, [-1] * pad]).astype(np.int64)

        image_feat, image_label, masked = self._random_region(
            rng, image_feat, num_boxes, overlaps)
        image_mask = np.zeros((R,), np.int32)
        image_mask[:num_boxes] = 1
        masked_label = np.zeros((R,), bool)
        masked_label[:num_boxes] = masked[:num_boxes] if masked.shape[0] >= \
            num_boxes else False

        out = {
            "input_ids": input_ids,
            "input_mask": input_mask,
            "segment_ids": segment_ids,
            "lm_label_ids": lm_labels,
            "is_match": np.int32(is_match),
            "image_feat": image_feat,
            "image_loc": image_loc,
            "image_cls": image_cls,
            "obj_labels": obj_labels,
            "obj_confs": obj_confs,
            "attr_labels": attr_labels,
            "attr_confs": attr_confs,
            "image_attrs": image_attrs,
            "image_label": image_label,
            "image_mask": image_mask,
            "image_id": np.int64(index),
        }
        if self.add_global_imgfeat:
            # global mean excludes overlap-masked regions
            # (reference: concept_cap_dataset.py:237-243)
            count = max(int((~masked_label[:num_boxes]).sum()), 1)
            g_feat = image_feat.sum(0, keepdims=True) / count
            g_loc = np.array([[0, 0, 1, 1] + [1] * (self.num_locs - 4)],
                             np.float32)
            if self.add_global_imgfeat == "first":
                out["image_feat"] = np.concatenate([g_feat, image_feat])
                out["image_loc"] = np.concatenate([g_loc, image_loc])
                out["image_mask"] = np.concatenate([[1], image_mask]).astype(
                    np.int32)
            else:
                out["image_feat"] = np.concatenate([image_feat, g_feat])
                out["image_loc"] = np.concatenate([image_loc, g_loc])
                out["image_mask"] = np.concatenate([image_mask, [1]]).astype(
                    np.int32)
        return out


def make_concap_loader(features_path: str, annotations_path: str, tokenizer,
                       *, split: str = "train", seq_len: int = 36,
                       region_len: int = 36, batch_size: int = 512,
                       num_workers: int = 8, objective: int = 0,
                       num_locs: int = 5, add_global_imgfeat=None,
                       seed: int = 0, num_shards: int = 1,
                       shard_index: int = 0):
    """Build the CC dataset + loader (reference: ConceptCapLoaderTrain/Val,
    concept_cap_dataset.py:178-330). Per-rank LMDB shards are honoured when
    present, otherwise all hosts stride over the single environment."""
    from ..loader import DataLoader

    if split == "train":
        shard = os.path.join(features_path,
                             f"training_feat_part_{shard_index}.lmdb")
        whole = os.path.join(features_path, "training_feat_all.lmdb")
        caption = os.path.join(annotations_path, "caption_train.json")
    else:
        shard = os.path.join(features_path,
                             f"validation_feat_part_{shard_index}.lmdb")
        whole = os.path.join(features_path, "validation_feat_all.lmdb")
        caption = os.path.join(annotations_path, "caption_valid.json")
    if os.path.exists(shard):
        lmdb_path, eff_shards, eff_index = shard, 1, 0
    else:
        lmdb_path, eff_shards, eff_index = whole, num_shards, shard_index
    if not os.path.exists(lmdb_path) and os.path.exists(features_path) \
            and features_path.endswith(".lmdb"):
        lmdb_path, eff_shards, eff_index = features_path, num_shards, \
            shard_index

    ds = ConceptCapDataset(
        lmdb_path, caption, tokenizer, seq_len=seq_len,
        region_len=region_len, split=split, objective=objective,
        num_locs=num_locs, add_global_imgfeat=add_global_imgfeat, seed=seed)
    loader = DataLoader(ds, batch_size, shuffle=(split == "train"),
                        seed=seed, drop_last=True, num_workers=num_workers,
                        num_shards=eff_shards, shard_index=eff_index)
    return ds, loader
