"""Gradient-accumulation parity against the reference recipe.

The reference divides each micro-batch loss by grad_acc_steps, lets
backward() accumulate, and every k micro-batches clips + steps + zeroes
(train_task.py:276-290, scheduler stepping once per optimizer step). Ours
is optax.MultiSteps around the clip+AdamW chain. Both sides run 2
optimizer steps of k=2 DIFFERENT micro-batches under a warmup-linear
schedule from one shared state dict; the final parameter trees must match
to the train-parity tolerances. This pins MultiSteps' mean-of-grads
semantics (== sum of loss/k grads), clip-on-accumulated placement, and
one-schedule-tick-per-optimizer-step."""

import json

import numpy as np
import pytest

import jax
import optax

from volta_tpu.checkpoint import import_state_dict
from volta_tpu.config import VoltaConfig
from volta_tpu.losses import pretraining_losses
from volta_tpu.models import VoltaForVLPreTraining
from volta_tpu.optimization import build_optimizer, warmup_linear_schedule
from volta_tpu.parallel.train_step import _strip_global

from _reference_oracle import load_reference, randomize_state_dict, \
    reference_available
from test_reference_parity import (_pretrain_labels, make_inputs,
                                   reduced_cfg_dict, to_torch)
from test_train_parity import BETAS, CLIP, EPS, LR, NO_DECAY, WD, _batch

torch = pytest.importorskip("torch")
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not reference_available(),
                                 reason="reference checkout not present")]

K = 2               # micro-batches per optimizer step
OPT_STEPS = 2
SCHEDULE = warmup_linear_schedule(LR, warmup_steps=1, total_steps=10)


def test_grad_accum_matches_reference(tmp_path):
    ref = load_reference()
    d = reduced_cfg_dict("ctrl_uniter_base")
    ref_cfg = ref.config.BertConfig.from_dict(json.loads(json.dumps(d)))
    torch.manual_seed(9500)
    ref_model = ref.encoders.BertForVLPreTraining(ref_cfg)
    randomize_state_dict(ref_model, 9500)
    cfg = VoltaConfig.from_dict(dict(d, use_pallas=False))

    micro = []
    for mb in range(K * OPT_STEPS):
        rng = np.random.RandomState(600 + mb)
        inputs = make_inputs(d, seed=700 + mb)
        labels, mlm_labels, itm_labels = _pretrain_labels(d, rng)
        micro.append((inputs, labels, mlm_labels, itm_labels,
                      _batch(d, inputs, labels, mlm_labels, itm_labels)))

    # ---- our side: MultiSteps(every_k=K) over clip+AdamW ------------------
    model = VoltaForVLPreTraining(cfg)
    ids, feats, locs, types_, t_mask, v_mask = micro[0][0]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids, feats, locs,
                                    types_, t_mask, v_mask)
    variables, report = import_state_dict(
        cfg, variables,
        {k: v.detach().numpy() for k, v in ref_model.state_dict().items()})
    assert not report["skipped"]
    params = variables["params"]
    tx = build_optimizer("adamw", SCHEDULE, params, weight_decay=WD,
                         clip_norm=CLIP, grad_accum_steps=K, betas=BETAS,
                         eps=EPS, correct_bias=False)

    def loss_fn(p, batch):
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
    def train_step(p, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    opt_state = tx.init(params)
    for _, _, _, _, batch in micro:
        params, opt_state, _ = train_step(params, opt_state, batch)

    # ---- reference recipe --------------------------------------------------
    lt = lambda x: torch.tensor(x)  # noqa: E731
    adam_state = {}
    opt_step = 0
    for mb, (inputs, labels, mlm_labels, itm_labels, _) in enumerate(micro):
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
        loss = (mlm + img + itm) / K          # train_task.py:276-277
        loss.backward()
        if (mb + 1) % K == 0:                 # train_task.py:280-290
            torch.nn.utils.clip_grad_norm_(ref_model.parameters(), CLIP)
            lr = float(SCHEDULE(opt_step))
            with torch.no_grad():
                for name, p in ref_model.named_parameters():
                    if p.grad is None:
                        continue
                    m, v = adam_state.setdefault(
                        name, (torch.zeros_like(p), torch.zeros_like(p)))
                    g = p.grad
                    m.mul_(BETAS[0]).add_(g, alpha=1 - BETAS[0])
                    v.mul_(BETAS[1]).addcmul_(g, g, value=1 - BETAS[1])
                    p.add_(m / (v.sqrt() + EPS), alpha=-lr)
                    if not any(nd in name for nd in NO_DECAY):
                        p.add_(p, alpha=-lr * WD)
            opt_step += 1
            ref_model.zero_grad()

    final_vars, report = import_state_dict(
        cfg, {"params": jax.tree.map(np.copy, params)},
        {k: v.detach().numpy() for k, v in ref_model.state_dict().items()})
    assert not report["skipped"]
    flat_ref = jax.tree_util.tree_flatten_with_path(final_vars["params"])[0]
    flat_ours = jax.tree_util.tree_flatten_with_path(params)[0]
    for (path_r, leaf_r), (path_o, leaf_o) in zip(flat_ref, flat_ours):
        assert path_r == path_o
        np.testing.assert_allclose(
            np.asarray(leaf_o), np.asarray(leaf_r), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path_r))
