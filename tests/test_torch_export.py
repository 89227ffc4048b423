"""Reverse checkpoint export: jax params -> reference-format torch state dict.

Completes the migration story in both directions: ``import_state_dict`` loads
reference/HF checkpoints into volta_tpu; ``export_torch_state_dict`` (its
inverse) emits a state dict the reference's own torch models load with
``strict=True`` (reference naming: volta/encoders.py, incl. the tied MLM
decoder volta/encoders.py:686-692 and the share_layer v_* alias keys
volta/encoders.py:208-217).

Proof obligations covered here:
  * round trip torch -> jax -> torch is key-set identical and bit-exact for
    BertModel, BertForVLPreTraining and BertForVLTasks trees;
  * a FRESH jax-initialised model (never touched torch) exports to a dict the
    reference loads strict=True, with forward parity between both frameworks
    on the exported weights;
  * the ``save_torch_checkpoint`` .bin round-trips through
    ``load_torch_state_dict``.
"""

import numpy as np
import pytest

import jax

from volta_tpu.checkpoint import (export_torch_state_dict, import_state_dict,
                                  load_torch_state_dict,
                                  save_torch_checkpoint)
from volta_tpu.config import VoltaConfig
from volta_tpu.models import (VoltaForVLPreTraining, VoltaForVLTasks,
                              VoltaModel)

from _reference_oracle import (load_reference, randomize_state_dict,
                               reference_available)
from test_reference_parity import (CONFIG_NAMES, TASK_CFG, TOL, build_pair,
                                   make_inputs, reduced_cfg_dict, to_torch)

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def _roundtrip_assert(sd, exported, report):
    assert not report["unexported"], report["unexported"]
    missing = set(sd) - set(exported)
    extra = set(exported) - set(sd)
    assert not missing, f"missing from export: {sorted(missing)}"
    assert not extra, f"unexpected in export: {sorted(extra)}"
    for k, v in sd.items():
        np.testing.assert_array_equal(exported[k], v, err_msg=k)


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=() if n in (
        "ctrl_uniter_base", "ctrl_vilbert_base", "ctrl_vl-bert_base")
        else (pytest.mark.slow,), id=n) for n in CONFIG_NAMES])
def test_bert_model_roundtrip(name):
    ref_model, sd, cfg, d = build_pair(name, reduced=True,
                                       seed=40 + CONFIG_NAMES.index(name))
    ids, feats, locs, types, t_mask, v_mask = make_inputs(d, seed=5)
    model = VoltaModel(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids, feats, locs,
                                 types, t_mask, v_mask)
    params, report = import_state_dict(cfg, params, sd)
    assert not report["skipped"], report["skipped"]
    exported, ex_report = export_torch_state_dict(cfg, params)
    _roundtrip_assert(sd, exported, ex_report)


def test_pretraining_roundtrip():
    ref = load_reference()
    import json
    d = reduced_cfg_dict("ctrl_uniter_base")
    ref_cfg = ref.config.BertConfig.from_dict(json.loads(json.dumps(d)))
    torch.manual_seed(50)
    ref_model = ref.encoders.BertForVLPreTraining(ref_cfg)
    sd = randomize_state_dict(ref_model, 50)
    cfg = VoltaConfig.from_dict(dict(d, use_pallas=False))
    ids, feats, locs, types, t_mask, v_mask = make_inputs(d, seed=5)
    model = VoltaForVLPreTraining(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids, feats, locs,
                                 types, t_mask, v_mask)
    params, report = import_state_dict(cfg, params, sd)
    assert not report["skipped"], report["skipped"]
    exported, ex_report = export_torch_state_dict(cfg, params)
    _roundtrip_assert(sd, exported, ex_report)
    # the tied decoder weight IS the word-embedding table
    np.testing.assert_array_equal(
        exported["cls.predictions.decoder.weight"],
        exported["bert.embeddings.word_embeddings.weight"])


def test_tasks_roundtrip():
    """All 6 classifier head types incl. the anonymous-Sequential 2-layer
    V-logit head (reference: volta/encoders.py:1141-1147)."""
    ref = load_reference()
    import json
    d = reduced_cfg_dict("ctrl_uniter_base")
    ref_cfg = ref.config.BertConfig.from_dict(json.loads(json.dumps(d)))
    torch.manual_seed(60)
    task_ids = tuple(TASK_CFG)
    ref_model = ref.encoders.BertForVLTasks(ref_cfg, TASK_CFG, list(task_ids))
    sd = randomize_state_dict(ref_model, 60)
    cfg = VoltaConfig.from_dict(dict(d, use_pallas=False))
    ids, feats, locs, types, t_mask, v_mask = make_inputs(d, seed=5)
    model = VoltaForVLTasks(cfg, TASK_CFG, task_ids)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), ids, feats, locs, "VQA", types, t_mask, v_mask)
    params, report = import_state_dict(cfg, params, sd)
    assert not report["skipped"], report["skipped"]
    exported, ex_report = export_torch_state_dict(cfg, params)
    _roundtrip_assert(sd, exported, ex_report)


@pytest.mark.parametrize("name", ["ctrl_uniter_base", "ctrl_vilbert_base"])
def test_fresh_init_export_loads_into_reference(name):
    """A model that never saw torch exports to a strict-loadable dict, and the
    reference forward on those weights matches ours — the 'train in
    volta_tpu, deploy in the reference' path."""
    ref = load_reference()
    import json
    d = reduced_cfg_dict(name)
    cfg = VoltaConfig.from_dict(dict(d, use_pallas=False))
    ids, feats, locs, types, t_mask, v_mask = make_inputs(d, seed=9)
    model = VoltaModel(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(42), ids, feats, locs,
                                 types, t_mask, v_mask)
    exported, report = export_torch_state_dict(cfg, params)
    assert not report["unexported"], report["unexported"]

    ref_cfg = ref.config.BertConfig.from_dict(json.loads(json.dumps(d)))
    torch.manual_seed(0)
    ref_model = ref.encoders.BertModel(ref_cfg)
    ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in exported.items()}, strict=True)
    ref_model.eval()

    seq_t, seq_v, pooled_t, pooled_v, _ = model.apply(
        params, ids, feats, locs, types, t_mask, v_mask)
    with torch.no_grad():
        r_t, r_v, r_pt, r_pv, _ = ref_model(
            *to_torch(ids, feats, locs, types, t_mask, v_mask))
    live_t = t_mask.astype(bool)
    np.testing.assert_allclose(np.asarray(seq_t)[live_t],
                               r_t.numpy()[live_t], **TOL)
    live_v = v_mask.astype(bool)
    np.testing.assert_allclose(np.asarray(seq_v)[live_v],
                               r_v.numpy()[live_v], **TOL)
    if r_pt is not None:
        np.testing.assert_allclose(np.asarray(pooled_t), r_pt.numpy(), **TOL)
    if r_pv is not None:
        np.testing.assert_allclose(np.asarray(pooled_v), r_pv.numpy(), **TOL)


def test_save_torch_checkpoint_roundtrip(tmp_path):
    """The .bin written by save_torch_checkpoint reloads through our own
    torch-format reader bit-exact."""
    import json
    d = reduced_cfg_dict("ctrl_uniter_base")
    cfg = VoltaConfig.from_dict(dict(d, use_pallas=False))
    ids, feats, locs, types, t_mask, v_mask = make_inputs(d, seed=3)
    model = VoltaModel(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(7), ids, feats, locs,
                                 types, t_mask, v_mask)
    exported, _ = export_torch_state_dict(cfg, params)
    path = str(tmp_path / "pytorch_model.bin")
    save_torch_checkpoint(path, cfg, params)
    loaded = load_torch_state_dict(path)
    assert set(loaded) == set(exported)
    for k in exported:
        np.testing.assert_array_equal(loaded[k], exported[k], err_msg=k)
