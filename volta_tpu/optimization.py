"""Optimizers and LR schedules (Optax).

Covers the reference's optimization surface:
  * AdamW with the ``correct_bias=False`` semantics of
    pytorch_transformers' BertAdam-style AdamW (reference:
    train_task.py:221-226 uses AdamW(correct_bias=False)).
  * RAdam / PlainRAdam (reference: volta/optimization.py:9-169).
  * warmup-linear / warmup-constant schedules (reference:
    train_task.py:227-234).
  * per-parameter no-decay masks for bias / LayerNorm params
    (reference: train_task.py:207-218).

All are optax GradientTransformations — XLA fuses the elementwise update
across the parameter pytree, replacing apex's multi_tensor kernels.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------- schedules
def warmup_linear_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int) -> optax.Schedule:
    """Linear warmup then linear decay to 0
    (pytorch_transformers WarmupLinearSchedule semantics)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.maximum(warmup_steps, 1)
        t = jnp.maximum(total_steps, 1)
        warm = step / w
        decay = jnp.maximum(0.0, (t - step) / jnp.maximum(1.0, t - w))
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return fn


def warmup_constant_schedule(base_lr: float, warmup_steps: int) -> optax.Schedule:
    """Linear warmup then constant."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.maximum(warmup_steps, 1)
        return base_lr * jnp.where(step < warmup_steps, step / w, 1.0)

    return fn


def constant_schedule(base_lr: float) -> optax.Schedule:
    return lambda step: jnp.full((), base_lr, jnp.float32)


SCHEDULES = {
    "warmup_linear": warmup_linear_schedule,
    "warmup_constant": lambda lr, w, t: warmup_constant_schedule(lr, w),
    "constant": lambda lr, w, t: constant_schedule(lr),
}


# ------------------------------------------------------------------- masks
# LayerNorm scales the reference trainers DO weight-decay: their no_decay
# filter matches the substrings 'bias' / 'LayerNorm.bias' / 'LayerNorm.weight'
# (reference: train_task.py:207-218, train_concap.py:201-224), which misses
# the norms whose torch PARAMETER PATHS don't contain "LayerNorm" —
# UNITER's image_layer_norm / image_location_layer_norm
# (volta/embeddings.py:421-422), VL-BERT's visual_ln_text /
# visual_ln_object (volta/embeddings.py:218-219), and the SimpleClassifier
# task heads, whose LN lives at Sequential slot "logit_fc.2"
# (volta/encoders.py:791-796). LXMERT's ImgLayerNorm / LocLayerNorm (our
# v_embeddings/{feat,loc}_ln) DO contain it and stay undecayed. Verified
# end-to-end by tests/test_train_parity.py.
_DECAYED_LN_SCALES = (
    ("embeddings", "feat_ln"),          # uniter image_layer_norm
    ("embeddings", "loc_ln"),           # uniter image_location_layer_norm
    ("embeddings", "visual_ln_text"),   # vl-bert
    ("embeddings", "visual_ln_object"),  # vl-bert
)


def _ref_decays_scale(names) -> bool:
    if len(names) < 3:
        return False
    mod, ln = names[-3], names[-2]
    if (mod, ln) in _DECAYED_LN_SCALES:
        return True
    # SimpleClassifier heads: torch path clfs_dict.<task>.logit_fc.2.weight
    return mod.startswith("clf_") and ln == "ln"


def no_decay_mask(params) -> Any:
    """True where weight decay applies; bias and LayerNorm scale/bias are
    excluded (reference: train_task.py:207-218 matches 'bias', 'LayerNorm'),
    except the reference's own name-based blind spots (see
    _DECAYED_LN_SCALES), which it decays and so do we."""

    def decide(path, _):
        names = [p.key for p in path if hasattr(p, "key")]
        leaf = names[-1] if names else ""
        if leaf == "bias" or leaf.endswith("_bias"):
            # decoder_bias is the tied MLM head's output bias — torch name
            # "cls.predictions.bias", undecayed by the reference filter
            return False
        if leaf == "scale":
            return _ref_decays_scale(names)
        if any("ln" == n or n.endswith("_ln") or "layer_norm" in n
               for n in names):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


# ------------------------------------------------------------------- adamw
def adamw(lr: Any, *, b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.01,
          correct_bias: bool = False, mask=None,
          state_dtype=None) -> optax.GradientTransformation:
    """AdamW; ``correct_bias=False`` skips the bias-correction terms exactly
    like pytorch_transformers' default used by the reference trainers.
    ``state_dtype`` stores the moments at reduced precision (opt-in HBM
    trade; see _scale_by_adam_no_correction). With ``correct_bias`` it
    maps to optax's ``mu_dtype`` (first moment only)."""
    if correct_bias:
        tx = optax.scale_by_adam(b1=b1, b2=b2, eps=eps,
                                 mu_dtype=state_dtype)
    else:
        tx = _scale_by_adam_no_correction(b1=b1, b2=b2, eps=eps,
                                          state_dtype=state_dtype)
    pieces = [tx]
    if weight_decay > 0:
        pieces.append(optax.add_decayed_weights(weight_decay, mask=mask))
    pieces.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*pieces)


class _AdamState(NamedTuple):
    mu: Any
    nu: Any


def _scale_by_adam_no_correction(b1, b2, eps, state_dtype=None):
    """``state_dtype`` (e.g. bfloat16) stores m/v at reduced precision:
    moments are updated in the grad dtype (f32) and cast down only for
    storage — an opt-in HBM-traffic trade (m/v are 2×params of f32 reads
    AND writes every step; measured ~1 ms of the headline step). bf16
    keeps f32's exponent range so sqrt(v) cannot over/underflow; the
    8-bit mantissa perturbs the update by ~0.4% — off by default."""
    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=state_dtype or p.dtype)
        return _AdamState(jax.tree.map(z, params), jax.tree.map(z, params))

    def update(grads, state, params=None):
        def _mu(m, g):
            return (b1 * m.astype(g.dtype) + (1 - b1) * g).astype(m.dtype)

        def _nu(v, g):
            return (b2 * v.astype(g.dtype) +
                    (1 - b2) * g * g).astype(v.dtype)

        mu = jax.tree.map(_mu, state.mu, grads)
        nu = jax.tree.map(_nu, state.nu, grads)
        upd = jax.tree.map(
            lambda m, v, g: (m.astype(g.dtype) /
                             (jnp.sqrt(v.astype(g.dtype)) + eps)),
            mu, nu, grads)
        return upd, _AdamState(mu, nu)

    return optax.GradientTransformation(init, update)


# ------------------------------------------------------------------- radam
class _RAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def radam(lr: Any, *, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
          degenerated_to_sgd: bool = True,
          mask=None) -> optax.GradientTransformation:
    """Rectified Adam (reference: volta/optimization.py:9-93).

    When the variance rectification term is non-positive, falls back to an
    SGD-style step (``degenerated_to_sgd``) exactly as the reference's
    RAdam (not PlainRAdam with degenerated_to_sgd=False).
    """
    rho_inf = 2.0 / (1.0 - b2) - 1.0

    def init(params):
        z = lambda p: jnp.zeros_like(p)
        return _RAdamState(jnp.zeros((), jnp.int32),
                           jax.tree.map(z, params), jax.tree.map(z, params))

    def update(grads, state, params=None):
        t = state.count + 1
        tf = t.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, grads)
        b1t = b1 ** tf
        b2t = b2 ** tf
        rho = rho_inf - 2.0 * tf * b2t / (1.0 - b2t)
        rect = jnp.sqrt(jnp.maximum(
            ((rho - 4) * (rho - 2) * rho_inf) /
            jnp.maximum((rho_inf - 4) * (rho_inf - 2) * rho, 1e-12), 0.0))
        # threshold is N_sma >= 5, NOT rho > 4: at b2=0.999 step 5 has
        # rho ~= 4.996, which the reference still treats as non-adaptive
        # (volta/optimization.py:63,84); adaptive first engages at step 6
        adaptive = rho >= 5.0
        # reference form: step = sqrt((1-b2t)*X)/(1-b1t) * m/(sqrt(v)+eps) —
        # eps sits OUTSIDE the bias correction, on raw sqrt(v)
        # (volta/optimization.py:63-71,86-88)
        step_adapt = rect * jnp.sqrt(1.0 - b2t) / (1.0 - b1t)
        step_sgd = (1.0 / (1.0 - b1t)) if degenerated_to_sgd else 0.0

        def leaf(m, v):
            denom = jnp.sqrt(v) + eps
            return jnp.where(adaptive, step_adapt * m / denom,
                             step_sgd * m)

        upd = jax.tree.map(leaf, mu, nu)
        return upd, _RAdamState(t, mu, nu)

    pieces = [optax.GradientTransformation(init, update)]
    if weight_decay > 0:
        pieces.append(optax.add_decayed_weights(weight_decay, mask=mask))
    pieces.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*pieces)


def plain_radam(lr, **kw):
    """PlainRAdam (reference: volta/optimization.py:96-169).

    The reference's PlainRAdam is update-for-update identical to its RAdam
    — including the SGD-style fallback when N_sma < 5
    (volta/optimization.py:164-166); the only difference there is a
    step-size cache. (The upstream RAdam repo's PlainRAdam drops the
    fallback, but the reference's copy does not.)"""
    kw.setdefault("degenerated_to_sgd", True)
    return radam(lr, **kw)


# ---------------------------------------------------- per-leaf LR scaling
def scale_updates_by(scales) -> optax.GradientTransformation:
    """Per-leaf LR multiplier on the FINAL update (after the optimizer step
    and the decoupled decay), the optax form of a torch per-param-group
    ``lr = scale * base_lr``: the group's decay is scaled with it, exactly
    like torch AdamW's ``p -= lr_g * (adam_dir + wd * p)``.

    Reference intent note: both of the reference's per-param-LR rules are
    dead code as shipped — train_task.py:211 matches ``"vil_" in key``
    against BertForVLTasks parameter names that never contain it (the heads
    live under ``clfs_dict.*``; ``vil_prediction`` is a forward-pass local,
    volta/encoders.py:1198-1204), and train_concap.py:215 slices
    ``key[12:]`` (written for a ``"module.bert."`` DDP prefix) on a model
    that is DDP-wrapped only later (train_concap.py:253), so the sliced
    names never match ``bert-base-uncased_weight_name.json`` and the 0.1×
    trunk LR never fires. We default to the as-shipped behavior (no
    scaling) and expose the *intended* rule via ``--trunk_lr_scale``."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        upd = jax.tree.map(lambda u, s: u * s, updates, scales)
        return upd, state

    return optax.GradientTransformation(init, update)


def lr_scales_from_loaded(params, loaded_paths, scale: float) -> Any:
    """Pytree of LR multipliers: ``scale`` for leaves whose dot-joined path
    is in ``loaded_paths`` (the checkpoint importer's report["loaded"]),
    1.0 elsewhere — the data-driven form of the reference's intended
    "pretrained trunk at 0.1× LR" rule (train_concap.py:213-224): exactly
    the parameters that came from the checkpoint train slower."""
    loaded = set(loaded_paths)

    def decide(path, _):
        names = [p.key for p in path if hasattr(p, "key")]
        return scale if ".".join(names) in loaded else 1.0

    return jax.tree_util.tree_map_with_path(decide, params)


def skip_disconnected(inner: optax.GradientTransformation
                      ) -> optax.GradientTransformation:
    """torch optimizers silently SKIP parameters autograd never reached
    (``p.grad is None`` -> no Adam step and no decoupled weight decay).
    The reference models do produce such parameters — e.g. LXMERT
    fine-tuning never routes the loss through the post-cross vision tail
    (vv-attention 31 / v-FF 32), so those weights stay at their initial
    values forever under the reference trainer, while a mask-less optax
    chain would still weight-decay them ~0.01%/step.

    This wrapper zeroes the FINAL update (decay included) of any parameter
    whose incoming gradient tensor is identically zero — the jax-side
    signature of graph disconnection (connected params in these models
    always have some nonzero element; there are no hard-zero
    nonlinearities). Off by default: it deviates from torch only in the
    measure-zero case of a *connected* whole-tensor-zero gradient, but we
    keep the simpler semantics unless reference-exactness is requested
    (--skip_disconnected_params / tests/test_train_parity.py)."""

    def init(params):
        return inner.init(params)

    def update(grads, state, params=None):
        mask = jax.tree.map(
            lambda g: (jnp.sum(jnp.abs(g)) > 0).astype(g.dtype), grads)
        upd, state = inner.update(grads, state, params)
        upd = jax.tree.map(lambda u, m: u * m, upd, mask)
        return upd, state

    return optax.GradientTransformation(init, update)


# -------------------------------------------------------------- assembly
def build_optimizer(name: str, schedule, params, *, weight_decay=0.01,
                    clip_norm: Optional[float] = None,
                    grad_accum_steps: int = 1, betas=None,
                    eps: Optional[float] = None,
                    correct_bias: bool = False,
                    state_dtype=None,
                    lr_scales=None,
                    skip_disconnected_params: bool = False
                    ) -> optax.GradientTransformation:
    """Assemble the full chain: clip -> optimizer(+decay mask) -> accum.

    ``betas``/``eps`` override the per-optimizer defaults — the reference
    pretraining CLI runs AdamW at betas (0.9, 0.98)
    (reference: train_concap.py:101,227). ``correct_bias`` only applies to
    AdamW (pytorch_transformers semantics). ``lr_scales`` (a pytree of
    per-leaf multipliers, see :func:`lr_scales_from_loaded`) implements
    torch-style per-param-group learning rates."""
    mask = no_decay_mask(params)
    kw = {}
    if betas is not None:
        kw["b1"], kw["b2"] = float(betas[0]), float(betas[1])
    if eps is not None:
        kw["eps"] = float(eps)
    if name == "adamw":
        tx = adamw(schedule, weight_decay=weight_decay, mask=mask,
                   correct_bias=correct_bias, state_dtype=state_dtype, **kw)
    elif name == "radam":
        tx = radam(schedule, weight_decay=weight_decay, mask=mask, **kw)
    elif name == "plain_radam":
        tx = plain_radam(schedule, weight_decay=weight_decay, mask=mask, **kw)
    else:
        raise ValueError(f"unknown optimizer {name}")
    if lr_scales is not None:
        tx = optax.chain(tx, scale_updates_by(lr_scales))
    if skip_disconnected_params:
        tx = skip_disconnected(tx)
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
