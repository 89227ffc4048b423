"""Mid-run migration: resume training FROM the reference's checkpoint tar.

The reference saves ``pytorch_ckpt_latest.tar`` = model state dict +
optimizer state dict + global_step (volta/train_utils.py:295-317) and
resumes from it (:319-340). ``resume_from_torch_tar`` imports all three:
weights through the production importer, AdamW first/second moments mapped
per parameter (reconstructing torch's optimizer-state indices from the
reference's grouping schemes), and global_step into the train state.

Proof: train k steps in torch (pytorch_transformers AdamW semantics, the
same transcription test_train_parity.py uses), write a reference-format
tar, resume HERE, continue k' steps on both sides — the loss trajectory
and final parameter trees must agree to the train-parity tolerances. If
the moments were not restored (fresh-zeros Adam state), the first
continued step's update would diverge by construction.

Both reference grouping schemes are exercised:
  * one param per group (train_task.py:208-218);
  * two groups, decay then no-decay (train_concap.py:204-210).
"""

import json
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from volta_tpu.checkpoint import import_state_dict, resume_from_torch_tar
from volta_tpu.config import VoltaConfig
from volta_tpu.losses import pretraining_losses
from volta_tpu.models import VoltaForVLPreTraining
from volta_tpu.optimization import build_optimizer, warmup_linear_schedule
from volta_tpu.parallel.train_step import _strip_global, create_train_state

from _reference_oracle import load_reference, randomize_state_dict, \
    reference_available
from test_reference_parity import (CONFIG_NAMES, _pretrain_labels,
                                   make_inputs, reduced_cfg_dict, to_torch)
from test_train_parity import BETAS, CLIP, EPS, LR, NO_DECAY, WD, _batch

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")

STEPS_BEFORE = 3
STEPS_AFTER = 2
# a REAL schedule, not a constant: resume must restore the schedule
# position too (optax's scale_by_schedule count) — warmup ends mid-way
# through the pre-tar steps, so a reset-to-0 count would replay warmup
# (first post-resume update = schedule(0) = 0.0) and fail the trajectory
SCHEDULE = warmup_linear_schedule(LR, warmup_steps=2, total_steps=20)


def _torch_adamw_step_lr(named_params, state, lr):
    """_torch_adamw_step with an explicit per-step learning rate."""
    with torch.no_grad():
        for name, p in named_params:
            if p.grad is None:
                continue
            m, v = state.setdefault(
                name, (torch.zeros_like(p), torch.zeros_like(p)))
            g = p.grad
            m.mul_(BETAS[0]).add_(g, alpha=1 - BETAS[0])
            v.mul_(BETAS[1]).addcmul_(g, g, value=1 - BETAS[1])
            p.add_(m / (v.sqrt() + EPS), alpha=-lr)
            if not any(nd in name for nd in NO_DECAY):
                p.add_(p, alpha=-lr * WD)


def _torch_optimizer_state_dict(named_params, adam_state, grouping):
    """Assemble a torch-format optimizer state dict from the hand-rolled
    AdamW state, with indices laid out exactly as torch would for the
    reference's two grouping schemes."""
    names = [n for n, _ in named_params]
    if grouping == "per_param":
        ordered = names
        groups = [{"lr": LR, "betas": BETAS, "eps": EPS,
                   "weight_decay": 0.0 if any(nd in n for nd in NO_DECAY)
                   else WD, "correct_bias": False, "params": [i]}
                  for i, n in enumerate(ordered)]
    else:  # two_group: decay params first, then no-decay
        decay = [n for n in names if not any(nd in n for nd in NO_DECAY)]
        nodecay = [n for n in names if any(nd in n for nd in NO_DECAY)]
        ordered = decay + nodecay
        groups = [
            {"lr": LR, "betas": BETAS, "eps": EPS, "weight_decay": WD,
             "correct_bias": False,
             "params": list(range(len(decay)))},
            {"lr": LR, "betas": BETAS, "eps": EPS, "weight_decay": 0.0,
             "correct_bias": False,
             "params": list(range(len(decay), len(ordered)))},
        ]
    state = {}
    for i, n in enumerate(ordered):
        m, v = adam_state[n]
        state[i] = {"step": STEPS_BEFORE, "exp_avg": m.clone(),
                    "exp_avg_sq": v.clone()}
    return {"state": state, "param_groups": groups}


def _unimportable_logger_object():
    """An instance whose class is NOT importable at unpickle time — stands
    in for the reference's live tbLogger object inside the tar."""
    mod = types.ModuleType("_vanishing_test_module")

    class Ghost:
        pass

    Ghost.__module__ = "_vanishing_test_module"
    Ghost.__qualname__ = "Ghost"
    mod.Ghost = Ghost
    sys.modules["_vanishing_test_module"] = mod
    obj = Ghost()
    obj.scores = [1, 2, 3]
    return obj


@pytest.mark.parametrize("grouping", [
    "per_param",
    pytest.param("two_group", marks=pytest.mark.slow),
])
def test_resume_from_reference_tar(tmp_path, grouping):
    ref = load_reference()
    name = "ctrl_uniter_base"
    d = reduced_cfg_dict(name)
    ref_cfg = ref.config.BertConfig.from_dict(json.loads(json.dumps(d)))
    torch.manual_seed(9100)
    ref_model = ref.encoders.BertForVLPreTraining(ref_cfg)
    randomize_state_dict(ref_model, 9100)
    cfg = VoltaConfig.from_dict(dict(d, use_pallas=False))

    rng = np.random.RandomState(41)
    inputs = make_inputs(d, seed=43)
    labels, mlm_labels, itm_labels = _pretrain_labels(d, rng)
    batch = _batch(d, inputs, labels, mlm_labels, itm_labels)
    lt = lambda x: torch.tensor(x)  # noqa: E731

    opt_step = [0]

    def torch_step(adam_state):
        ref_model.zero_grad()
        # fresh tensors per step (VL-BERT-style in-place input mutation)
        tb = to_torch(*inputs)
        mlm, img, itm = ref_model(
            *tb, masked_lm_labels=lt(mlm_labels),
            image_label=lt(labels["image_label"]),
            image_cls=lt(labels["image_cls"]),
            obj_labels=lt(labels["obj_labels"]),
            obj_confs=lt(labels["obj_confs"]),
            attr_labels=lt(labels["attr_labels"]),
            attr_confs=lt(labels["attr_confs"]),
            image_attrs=None, next_sentence_label=lt(itm_labels))
        loss = mlm + img + itm
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), CLIP)
        _torch_adamw_step_lr(list(ref_model.named_parameters()), adam_state,
                             float(SCHEDULE(opt_step[0])))
        opt_step[0] += 1
        return float(loss.detach())

    adam_state = {}
    for _ in range(STEPS_BEFORE):
        torch_step(adam_state)

    # ---- write the reference-format tar (volta/train_utils.py:305-317)
    tar_path = str(tmp_path / "pytorch_ckpt_latest.tar")
    ghost = _unimportable_logger_object()
    torch.save(
        {"model_state_dict": ref_model.state_dict(),
         "optimizer_state_dict": _torch_optimizer_state_dict(
             list(ref_model.named_parameters()), adam_state, grouping),
         "scheduler_state_dict": {"last_epoch": STEPS_BEFORE},
         "global_step": STEPS_BEFORE,
         "epoch_id": 0,
         "tb_logger": ghost,
         "score": 0.25},
        tar_path)
    del sys.modules["_vanishing_test_module"]

    # ---- our side: fresh state, resume from the tar -----------------------
    model = VoltaForVLPreTraining(cfg)
    ids, feats, locs, types_, t_mask, v_mask = inputs
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids, feats, locs,
                                    types_, t_mask, v_mask)
    params = variables["params"]
    tx = build_optimizer("adamw", SCHEDULE, params, weight_decay=WD,
                         clip_norm=CLIP, betas=BETAS, eps=EPS,
                         correct_bias=False)
    state = create_train_state(jax.random.PRNGKey(1), params, tx)
    state, info = resume_from_torch_tar(cfg, state, tar_path)
    assert int(state.step) == STEPS_BEFORE
    assert info["epoch_id"] == 0 and info["score"] == 0.25
    assert info["hyperparams"]["correct_bias"] is False

    def loss_fn(p):
        out = model.apply(
            {"params": p}, batch["input_ids"], batch["image_feat"],
            batch["image_loc"], batch["segment_ids"], batch["input_mask"],
            batch["image_mask"], deterministic=True)
        mlm, mrm, itm = pretraining_losses(
            cfg, out, masked_lm_labels=batch["lm_label_ids"],
            image_label=batch["image_label"], image_cls=batch["image_cls"],
            image_feat=_strip_global(cfg, batch["image_feat"]),
            obj_labels=batch["obj_labels"], obj_confs=batch["obj_confs"],
            attr_labels=batch["attr_labels"], attr_confs=batch["attr_confs"],
            next_sentence_label=batch["is_match"])
        return mlm + mrm + itm

    @jax.jit
    def train_step(p, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    p, opt_state = state.params, state.opt_state
    ours = []
    for _ in range(STEPS_AFTER):
        p, opt_state, loss = train_step(p, opt_state)
        ours.append(float(loss))

    # ---- torch side continues --------------------------------------------
    theirs = [torch_step(adam_state) for _ in range(STEPS_AFTER)]

    # trajectory + final params must agree (train-parity tolerances); a
    # zeroed Adam state would shrink our first continued update by ~1-b1
    # and fail both comparisons
    np.testing.assert_allclose(ours, theirs, rtol=3e-3)
    final_vars, report = import_state_dict(
        cfg, {"params": jax.tree.map(np.copy, params)},
        {k: v.detach().numpy() for k, v in ref_model.state_dict().items()})
    assert not report["skipped"], report["skipped"]
    flat_ref = jax.tree_util.tree_flatten_with_path(
        final_vars["params"])[0]
    flat_ours = jax.tree_util.tree_flatten_with_path(p)[0]
    assert len(flat_ref) == len(flat_ours)
    for (path_r, leaf_r), (path_o, leaf_o) in zip(flat_ref, flat_ours):
        assert path_r == path_o
        np.testing.assert_allclose(
            np.asarray(leaf_o), np.asarray(leaf_r), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path_r))


def test_radam_tar_moments_land_transposed(tmp_path):
    """No reference needed: a synthetic RAdam tar (same state keys as
    volta/optimization.py:38-40) restores into our _RAdamState — dense
    kernels' moments transposed alongside their weights, count = step."""
    from volta_tpu import zoo
    from volta_tpu.checkpoint import export_torch_state_dict, \
        _alias_key_set
    from volta_tpu.optimization import _RAdamState
    from volta_tpu.models import VoltaModel

    cfg = zoo.single_stream(
        "uniter", depth=2, hidden_size=32, num_attention_heads=4,
        intermediate_size=48, pooler_size=32, v_pooler_size=32,
        vocab_size=19, max_position_embeddings=32, v_feature_size=16,
        v_hidden_size=32, v_num_attention_heads=4, v_intermediate_size=48,
        use_pallas=False)
    model = VoltaModel(cfg)
    b, L, R = 2, 8, 5
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((b, L), np.int32),
        np.zeros((b, R, 16), np.float32), np.zeros((b, R, 5), np.float32),
        np.zeros((b, L), np.int32), np.ones((b, L), np.int32),
        np.ones((b, R), np.int32))
    params = variables["params"]
    msd, _ = export_torch_state_dict(cfg, params)

    rng = np.random.RandomState(3)
    named = [k for k in msd if k not in _alias_key_set(cfg, msd)]
    state, groups = {}, []
    moments = {}
    for i, n in enumerate(named):
        m = rng.randn(*msd[n].shape).astype(np.float32)
        v = np.abs(rng.randn(*msd[n].shape)).astype(np.float32)
        moments[n] = (m, v)
        state[i] = {"step": 7, "exp_avg": torch.from_numpy(m),
                    "exp_avg_sq": torch.from_numpy(v)}
        groups.append({"lr": 1e-3, "weight_decay": 0.0, "params": [i]})
    tar = str(tmp_path / "radam.tar")
    torch.save({"model_state_dict":
                {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in msd.items()},
                "optimizer_state_dict": {"state": state,
                                         "param_groups": groups},
                "global_step": 7, "epoch_id": 2}, tar)

    tx = build_optimizer("radam", 1e-3, params, weight_decay=0.0)
    st = create_train_state(jax.random.PRNGKey(1), params, tx)
    st, info = resume_from_torch_tar(cfg, st, tar)
    assert int(st.step) == 7 and info["epoch_id"] == 2

    def find_radam(node):
        if isinstance(node, _RAdamState):
            return node
        if isinstance(node, tuple):
            for x in node:
                r = find_radam(x)
                if r is not None:
                    return r
        return None

    rstate = find_radam(st.opt_state)
    assert rstate is not None
    assert int(rstate.count) == 7
    # a dense kernel: torch stores [out,in]; our kernel (and so its
    # moments) is [in,out]
    key = "encoder.layer.0.attention_self.query.weight"
    mu_leaf = np.asarray(
        rstate.mu["encoder"]["attn_0"]["query"]["kernel"])
    np.testing.assert_array_equal(mu_leaf, moments[key][0].T)
    nu_leaf = np.asarray(
        rstate.nu["encoder"]["attn_0"]["query"]["kernel"])
    np.testing.assert_array_equal(nu_leaf, moments[key][1].T)


def test_tar_resume_reaches_state_inside_multisteps(tmp_path):
    """Moments and the schedule count must be restored through the
    optax.MultiSteps wrapper grad accumulation adds."""
    from volta_tpu import zoo
    from volta_tpu.checkpoint import export_torch_state_dict, \
        _alias_key_set
    from volta_tpu.optimization import _AdamState, warmup_linear_schedule
    from volta_tpu.models import VoltaModel

    cfg = zoo.single_stream(
        "uniter", depth=1, hidden_size=32, num_attention_heads=4,
        intermediate_size=48, pooler_size=32, v_pooler_size=32,
        vocab_size=19, max_position_embeddings=32, v_feature_size=16,
        v_hidden_size=32, v_num_attention_heads=4, v_intermediate_size=48,
        use_pallas=False)
    model = VoltaModel(cfg)
    b, L, R = 2, 8, 5
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((b, L), np.int32),
        np.zeros((b, R, 16), np.float32), np.zeros((b, R, 5), np.float32),
        np.zeros((b, L), np.int32), np.ones((b, L), np.int32),
        np.ones((b, R), np.int32))
    params = variables["params"]
    msd, _ = export_torch_state_dict(cfg, params)
    named = [k for k in msd if k not in _alias_key_set(cfg, msd)]
    state = {i: {"step": 11,
                 "exp_avg": torch.from_numpy(
                     np.full(msd[n].shape, 0.5, np.float32)),
                 "exp_avg_sq": torch.from_numpy(
                     np.full(msd[n].shape, 0.25, np.float32))}
             for i, n in enumerate(named)}
    groups = [{"lr": 1e-3, "weight_decay": 0.0, "params": [i]}
              for i in range(len(named))]
    tar = str(tmp_path / "accum.tar")
    torch.save({"model_state_dict":
                {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in msd.items()},
                "optimizer_state_dict": {"state": state,
                                         "param_groups": groups},
                "global_step": 11, "epoch_id": 3}, tar)

    sched = warmup_linear_schedule(1e-3, 4, 100)
    tx = build_optimizer("adamw", sched, params, weight_decay=0.01,
                         clip_norm=1.0, grad_accum_steps=2)
    st = create_train_state(jax.random.PRNGKey(1), params, tx)
    st, info = resume_from_torch_tar(cfg, st, tar)
    assert int(st.step) == 11

    found_adam, found_sched = [], []

    def walk(node):
        if isinstance(node, _AdamState):
            found_adam.append(node)
        if isinstance(node, optax.ScaleByScheduleState):
            found_sched.append(node)
        if isinstance(node, tuple):
            for x in node:
                walk(x)

    walk(st.opt_state)
    assert found_adam and found_sched
    mu_leaf = jax.tree_util.tree_leaves(found_adam[0].mu)[0]
    assert float(np.asarray(mu_leaf).ravel()[0]) == 0.5
    assert all(int(s.count) == 11 for s in found_sched)
