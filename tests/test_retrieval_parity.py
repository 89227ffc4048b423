"""Retrieval eval parity: our device-gallery batched scorer vs the
reference model scoring every (caption, image) pair naively.

eval_retrieval.py redesigns the reference's loop (which re-ships the
gallery for every caption, reference: eval_retrieval.py:150-200) into
caption-tiled forwards over device-resident gallery chunks, with tail
padding and chunk reassembly. The e2e tests only bound the metrics; this
test proves the ASSEMBLY: the ranked image order our CLI dumps must equal
the order induced by the reference torch model evaluated pair-by-pair on
the exact same caption/gallery tensors (one shared randomized state dict,
fp32 both sides). Chunking (gallery_chunk=4 over 8 images), caption
tiling (captions_per_forward=3 over 16 captions), and the padded tail
block are all exercised.
"""

import json
import os
import sys
from unittest import mock

import numpy as np
import pytest

import fixtures
from _reference_oracle import load_reference, randomize_state_dict, \
    reference_available
from volta_tpu import zoo

torch = pytest.importorskip("torch")
yaml = pytest.importorskip("yaml")
pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def test_retrieval_order_matches_reference_pairwise(tmp_path):
    tmp = str(tmp_path)
    ids = list(range(20, 28))
    feat_path = fixtures.make_features_lmdb(tmp, ids, feature_size=32)
    ann = fixtures.make_retrieval_annotations(tmp, ids)
    vocab = fixtures.make_vocab(tmp)

    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg_path = os.path.join(tmp, "model.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json_string())

    yml = f"""
TASK8:
  name: RetrievalFlickr30k
  type: VL-logit
  num_labels: 1
  loss: CrossEntropyLoss
  process: retrieval
  dataroot: {tmp}
  features_h5path1: {feat_path}
  features_h5path2: ''
  train_annotations_jsonpath: {ann}
  val_annotations_jsonpath: {ann}
  max_seq_length: 10
  max_region_num: 6
  batch_size: 4
  train_split: train
  val_split: train
  lr: 0.0001
  num_epoch: 1
"""
    yml_path = os.path.join(tmp, "tasks.yml")
    open(yml_path, "w").write(yml)

    # one randomized state dict shared by both frameworks
    ref = load_reference()
    ref_cfg = ref.config.BertConfig.from_json_file(cfg_path)
    task_cfg = yaml.safe_load(yml)
    torch.manual_seed(777)
    ref_model = ref.encoders.BertForVLTasks(ref_cfg, task_cfg, ["TASK8"])
    sd = randomize_state_dict(ref_model, 777)
    bin_path = os.path.join(tmp, "shared.bin")
    torch.save({k: torch.from_numpy(np.asarray(v)) if not
                torch.is_tensor(v) else v for k, v in sd.items()}, bin_path)

    # ---- our CLI: chunked gallery (4x2) + caption tiling (3-wide, 16
    # captions -> padded tail)
    import eval_retrieval
    from volta_tpu.data.datasets import retrieval as rmod

    argv = ["eval_retrieval.py",
            "--config_file", cfg_path,
            "--tasks_config_file", yml_path,
            "--task", "8",
            "--vocab_file", vocab,
            "--from_pretrained", bin_path,
            "--captions_per_forward", "3",
            "--output_dir", os.path.join(tmp, "results"),
            "--num_workers", "0",
            "--compute_dtype", "float32",
            "--no_pallas"]
    orig_init = rmod.RetrievalDatasetVal.__init__

    def patched(self, *a, **kw):
        kw["gallery_chunk"] = 4
        return orig_init(self, *a, **kw)

    with mock.patch.object(rmod.RetrievalDatasetVal, "__init__", patched), \
            mock.patch.object(sys, "argv", argv):
        eval_retrieval.main()

    res_dir = os.path.join(tmp, "results")
    run = os.listdir(res_dir)[0]
    ours = json.load(open(os.path.join(res_dir, run, "train_result.json")))

    # ---- reference side: naive pair-by-pair scoring on the SAME tensors
    from volta_tpu.data import ImageFeaturesReader
    from volta_tpu.data.tokenization import BertTokenizer

    reader = ImageFeaturesReader(feat_path, num_locs=cfg.num_locs,
                                 add_global_imgfeat=cfg.add_global_imgfeat,
                                 feature_size=32)
    ds = rmod.RetrievalDatasetVal(
        "TASK8", tmp, ann, "train", reader, None,
        BertTokenizer(vocab), max_seq_length=10, max_region_num=6,
        num_locs=cfg.num_locs, add_global_imgfeat=cfg.add_global_imgfeat,
        gallery_chunk=4)
    n_img = ds.num_images
    feats = torch.tensor(ds.features_all[:n_img])
    locs = torch.tensor(ds.spatials_all[:n_img])
    im_mask = torch.tensor(ds.image_mask_all[:n_img], dtype=torch.long)
    ref_orders = []
    with torch.no_grad():
        for ci in range(len(ds.entries)):
            q, qm, qs = ds.caption(ci)
            rep = lambda x: torch.tensor(  # noqa: E731
                np.broadcast_to(np.asarray(x)[None], (n_img,) +
                                np.asarray(x).shape).copy(),
                dtype=torch.long)
            vil, _, _, _ = ref_model(rep(q), feats, locs, "TASK8",
                                     token_type_ids=rep(qs),
                                     attention_mask=rep(qm),
                                     image_attention_mask=im_mask)
            scores = vil[:, 0].numpy()
            ref_orders.append(np.argsort(-scores, kind="stable").tolist())

    assert len(ours) == len(ref_orders)
    for ci, (our_order, ref_order) in enumerate(zip(ours, ref_orders)):
        assert our_order[: len(ref_order)] == ref_order, (
            ci, our_order, ref_order)


def test_zero_shot_order_matches_reference_pairwise(tmp_path):
    """--zero_shot branch: ITM softmax[:, 0] over the pretraining model
    (reference: eval_retrieval.py:180-188) — same assembly proof.

    Reference quirk: its label-less pretraining forward crashes as shipped
    (`img_loss.cpu()` on int 0, encoders.py:1081-1089 — every criterion
    returns plain 0 when labels are None, losses.py:16-23), so the torch
    side here passes dummy all-ignored labels, which leave the ITM logits
    untouched but keep img_loss a tensor."""
    tmp = str(tmp_path)
    ids = list(range(40, 46))
    feat_path = fixtures.make_features_lmdb(tmp, ids, feature_size=32)
    ann = fixtures.make_retrieval_annotations(tmp, ids)
    vocab = fixtures.make_vocab(tmp)

    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=48, num_attention_heads=4,
        intermediate_size=64, pooler_size=48, v_pooler_size=48,
        vocab_size=23, max_position_embeddings=64, v_feature_size=32,
        v_hidden_size=48, v_num_attention_heads=4, v_intermediate_size=64,
        clf_hidden_size=32)
    cfg_path = os.path.join(tmp, "model.json")
    open(cfg_path, "w").write(cfg.to_json_string())
    yml_path = os.path.join(tmp, "tasks.yml")
    open(yml_path, "w").write(f"""
TASK8:
  name: RetrievalFlickr30k
  type: VL-logit
  num_labels: 1
  loss: CrossEntropyLoss
  process: retrieval
  dataroot: {tmp}
  features_h5path1: {feat_path}
  features_h5path2: ''
  train_annotations_jsonpath: {ann}
  val_annotations_jsonpath: {ann}
  max_seq_length: 10
  max_region_num: 6
  batch_size: 4
  train_split: train
  val_split: train
  lr: 0.0001
  num_epoch: 1
""")

    ref = load_reference()
    ref_cfg = ref.config.BertConfig.from_json_file(cfg_path)
    torch.manual_seed(778)
    ref_model = ref.encoders.BertForVLPreTraining(ref_cfg)
    sd = randomize_state_dict(ref_model, 778)
    bin_path = os.path.join(tmp, "shared.bin")
    torch.save({k: torch.from_numpy(np.asarray(v)) if not
                torch.is_tensor(v) else v for k, v in sd.items()}, bin_path)

    import eval_retrieval
    from volta_tpu.data.datasets import retrieval as rmod

    argv = ["eval_retrieval.py", "--config_file", cfg_path,
            "--tasks_config_file", yml_path, "--task", "8",
            "--vocab_file", vocab, "--from_pretrained", bin_path,
            "--captions_per_forward", "2",
            "--output_dir", os.path.join(tmp, "results"),
            "--num_workers", "0", "--compute_dtype", "float32",
            "--no_pallas", "--zero_shot"]
    orig_init = rmod.RetrievalDatasetVal.__init__

    def patched(self, *a, **kw):
        kw["gallery_chunk"] = 3
        return orig_init(self, *a, **kw)

    with mock.patch.object(rmod.RetrievalDatasetVal, "__init__", patched), \
            mock.patch.object(sys, "argv", argv):
        eval_retrieval.main()
    run = os.listdir(os.path.join(tmp, "results"))[0]
    ours = json.load(open(os.path.join(tmp, "results", run,
                                       "train_result.json")))

    from volta_tpu.data import ImageFeaturesReader
    from volta_tpu.data.tokenization import BertTokenizer

    reader = ImageFeaturesReader(feat_path, num_locs=cfg.num_locs,
                                 add_global_imgfeat=cfg.add_global_imgfeat,
                                 feature_size=32)
    ds = rmod.RetrievalDatasetVal(
        "TASK8", tmp, ann, "train", reader, None,
        BertTokenizer(vocab), max_seq_length=10, max_region_num=6,
        num_locs=cfg.num_locs, add_global_imgfeat=cfg.add_global_imgfeat,
        gallery_chunk=3)
    n_img = ds.num_images
    feats = torch.tensor(ds.features_all[:n_img])
    locs = torch.tensor(ds.spatials_all[:n_img])
    im_mask = torch.tensor(ds.image_mask_all[:n_img], dtype=torch.long)
    ref_orders = []
    with torch.no_grad():
        for ci in range(len(ds.entries)):
            q, qm, qs = ds.caption(ci)
            rep = lambda x: torch.tensor(  # noqa: E731
                np.broadcast_to(np.asarray(x)[None], (n_img,) +
                                np.asarray(x).shape).copy(),
                dtype=torch.long)
            rs = feats.shape[1] - 1  # scores after the global-row strip
            dummy_label = torch.full((n_img, rs), -1, dtype=torch.long)
            dummy_cls = torch.full((n_img, rs, 1601), 1.0 / 1601)
            _, _, itm, _, _ = ref_model(rep(q), feats, locs, rep(qs),
                                        rep(qm), im_mask,
                                        image_label=dummy_label,
                                        image_cls=dummy_cls)
            scores = torch.softmax(itm, dim=1)[:, 0].numpy()
            ref_orders.append(np.argsort(-scores, kind="stable").tolist())

    assert len(ours) == len(ref_orders)
    for ci, (our_order, ref_order) in enumerate(zip(ours, ref_orders)):
        assert our_order[: len(ref_order)] == ref_order, (
            ci, our_order, ref_order)
