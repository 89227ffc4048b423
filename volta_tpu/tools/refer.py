"""REFER API: referring-expression annotations over COCO-style instances.

reference: tools/refer/refer.py:46-328 (the REFER class). Loads
``refs(<splitBy>).p`` + ``instances.json`` and builds the same indices
(Refs/Anns/Imgs/Cats and the cross maps); ``get_mask`` decodes polygon or
RLE segmentations through the native mask codec.

Layout: <data_root>/<dataset>/refs(<splitBy>).p and instances.json.
"""

from __future__ import annotations

import itertools
import json
import os
import pickle
from typing import Dict, List

import numpy as np

from . import _mask


class REFER:
    def __init__(self, data_root: str, dataset: str = "refcoco",
                 splitBy: str = "unc"):
        self.data_root = data_root
        self.dataset = dataset
        base = os.path.join(data_root, dataset)
        if not os.path.isdir(base):
            base = data_root
        # image locations, as in the reference (tools/refer/refer.py:55-58)
        if dataset == "refclef":
            self.IMAGE_DIR = os.path.join(data_root, "images/saiapr_tc-12")
        else:
            self.IMAGE_DIR = os.path.join(
                data_root, "images/mscoco/images/train2014")
        with open(os.path.join(base, f"refs({splitBy}).p"), "rb") as f:
            self.data_refs = pickle.load(f)
        with open(os.path.join(base, "instances.json")) as f:
            instances = json.load(f)
        self.Anns = {a["id"]: a for a in instances["annotations"]}
        self.Imgs = {i["id"]: i for i in instances["images"]}
        self.Cats = {c["id"]: c["name"] for c in instances["categories"]}
        self.Refs = {r["ref_id"]: r for r in self.data_refs}
        self.imgToRefs: Dict[int, List] = {}
        self.imgToAnns: Dict[int, List] = {}
        self.refToAnn = {}
        self.annToRef = {}
        self.catToRefs: Dict[int, List] = {}
        self.sentToRef = {}
        self.Sents = {}
        for ref in self.data_refs:
            self.imgToRefs.setdefault(ref["image_id"], []).append(ref)
            self.catToRefs.setdefault(ref["category_id"], []).append(ref)
            self.refToAnn[ref["ref_id"]] = self.Anns[ref["ann_id"]]
            self.annToRef[ref["ann_id"]] = ref
            for sent in ref["sentences"]:
                self.Sents[sent["sent_id"]] = sent
                self.sentToRef[sent["sent_id"]] = ref
        for ann in instances["annotations"]:
            self.imgToAnns.setdefault(ann["image_id"], []).append(ann)

    # ------------------------------------------------------------- queries
    def getRefIds(self, image_ids=None, cat_ids=None, ref_ids=None,
                  split: str = "") -> List[int]:
        refs = self.data_refs
        if image_ids:
            ids = set(np.atleast_1d(image_ids).tolist())
            refs = [r for r in refs if r["image_id"] in ids]
        if cat_ids:
            ids = set(np.atleast_1d(cat_ids).tolist())
            refs = [r for r in refs if r["category_id"] in ids]
        if ref_ids:
            ids = set(np.atleast_1d(ref_ids).tolist())
            refs = [r for r in refs if r["ref_id"] in ids]
        if split:
            if split in ("testA", "testB", "testC"):
                refs = [r for r in refs if split[-1] in r["split"]]
            elif split in ("testAB", "testBC", "testAC"):
                refs = [r for r in refs if r["split"] == split]
            elif split == "test":
                refs = [r for r in refs if "test" in r["split"]]
            else:
                refs = [r for r in refs if r["split"] == split]
        return [r["ref_id"] for r in refs]

    def getAnnIds(self, image_ids=None, cat_ids=None, ref_ids=None):
        if image_ids:
            ids = set(np.atleast_1d(image_ids).tolist())
            anns = itertools.chain.from_iterable(
                self.imgToAnns.get(i, []) for i in ids)
            ann_ids = [a["id"] for a in anns]
        else:
            ann_ids = list(self.Anns)
        if cat_ids:
            ids = set(np.atleast_1d(cat_ids).tolist())
            ann_ids = [a for a in ann_ids
                       if self.Anns[a]["category_id"] in ids]
        if ref_ids:
            ids = set(np.atleast_1d(ref_ids).tolist())
            wanted = {self.Refs[r]["ann_id"] for r in ids}
            ann_ids = [a for a in ann_ids if a in wanted]
        return ann_ids

    def getImgIds(self, ref_ids=None):
        if ref_ids:
            return list({self.Refs[r]["image_id"]
                         for r in np.atleast_1d(ref_ids).tolist()})
        return list(self.Imgs)

    def getCatIds(self):
        return list(self.Cats)

    def loadRefs(self, ref_ids):
        return [self.Refs[r] for r in np.atleast_1d(ref_ids).tolist()]

    def loadAnns(self, ann_ids):
        return [self.Anns[a] for a in np.atleast_1d(ann_ids).tolist()]

    def loadImgs(self, image_ids):
        return [self.Imgs[i] for i in np.atleast_1d(image_ids).tolist()]

    def loadCats(self, cat_ids):
        return [self.Cats[c] for c in np.atleast_1d(cat_ids).tolist()]

    def getRefBox(self, ref_id) -> List[float]:
        return self.refToAnn[ref_id]["bbox"]

    def get_mask(self, ref) -> Dict:
        """Binary mask + area for a ref's segmentation
        (reference: tools/refer/refer.py:279-308)."""
        ann = self.refToAnn[ref["ref_id"]]
        image = self.Imgs[ref["image_id"]]
        seg = ann["segmentation"]
        h, w = image["height"], image["width"]
        if isinstance(seg, list):
            if isinstance(seg[0], list):
                rles = _mask.fr_poly(seg, h, w)
            else:
                rles = _mask.fr_poly([seg], h, w)
            rle = _mask.merge(rles) if len(rles) > 1 else rles[0]
        else:
            rle = seg if isinstance(seg["counts"], (list, bytes, str)) \
                else seg
        m = _mask.decode(rle)
        return {"mask": m, "area": int(m.sum())}

    getMask = get_mask

    # ---------------------------------------------------------- rendering
    def _load_image(self, image):
        """The ref's photo from IMAGE_DIR, or a white canvas at the
        record's dims when the image archive isn't on disk (this sandbox,
        feature-only deployments)."""
        path = os.path.join(self.IMAGE_DIR, image.get("file_name", ""))
        if image.get("file_name") and os.path.exists(path):
            from PIL import Image

            return np.asarray(Image.open(path).convert("RGB"))
        return np.full((image["height"], image["width"], 3), 255, np.uint8)

    def showRef(self, ref, seg_box: str = "seg", ax=None, save: str = ""):
        """Render a referring expression: image + its sentences + either
        the segmentation (thick yellow / thin red polygon outlines, or a
        green mask overlay for RLE segmentations) or the bounding box
        (reference: tools/refer/refer.py:236-277). With ``save`` the
        figure is written as a PNG (Agg — no display needed)."""
        import matplotlib
        if save:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.collections import PatchCollection
        from matplotlib.patches import Polygon, Rectangle

        ax = ax or plt.gca()
        image = self.Imgs[ref["image_id"]]
        ax.imshow(self._load_image(image))
        for sid, sent in enumerate(ref["sentences"]):
            print("%s. %s" % (sid + 1, sent.get("sent", sent.get("raw", ""))))
        ann = self.Anns[ref["ann_id"]]
        if seg_box == "seg":
            seg = ann["segmentation"]
            if isinstance(seg, list) and isinstance(seg[0], list):
                polygons = [
                    Polygon(np.asarray(s, float).reshape(-1, 2), alpha=0.4)
                    for s in seg]
                ax.add_collection(PatchCollection(
                    polygons, facecolors="none", edgecolors=(1, 1, 0),
                    linewidths=3, alpha=1))
                ax.add_collection(PatchCollection(
                    polygons, facecolors="none", edgecolors=(1, 0, 0),
                    linewidths=1, alpha=1))
            else:
                m = self.get_mask(ref)["mask"].astype(float)
                overlay = np.empty(m.shape + (3,), float)
                overlay[...] = np.array([2.0, 166.0, 101.0]) / 255
                ax.imshow(np.dstack((overlay, m * 0.5)))
        elif seg_box == "box":
            x, y, w, h = self.getRefBox(ref["ref_id"])
            ax.add_patch(Rectangle((x, y), w, h, fill=False,
                                   edgecolor="green", linewidth=3))
        if save:
            ax.figure.savefig(save, bbox_inches="tight")
            plt.close(ax.figure)
        return ax

    def showMask(self, ref, ax=None, save: str = ""):
        """Render the ref's binary mask (reference:
        tools/refer/refer.py:329-333)."""
        import matplotlib
        if save:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ax = ax or plt.gca()
        ax.imshow(self.get_mask(ref)["mask"])
        if save:
            ax.figure.savefig(save, bbox_inches="tight")
            plt.close(ax.figure)
        return ax
