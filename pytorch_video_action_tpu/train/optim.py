"""Optimizer: Adam + StepLR-equivalent schedule.

Reference (``train.py:273-274``): ``Adam(lr, betas=(0.9, 0.999), eps=1e-8)``
with ``StepLR(step_size, gamma)`` stepped once per epoch, and only when
``lr_step_size > 0 and lr_gamma < 1`` (``train.py:334-335``).

The schedule is driven by an epoch counter fed from the train loop, so the
jitted train step never retraces on learning-rate changes.
"""

from __future__ import annotations

import os

import optax

# Flattened optimizer state: Adam over ONE concatenated vector instead of
# per-leaf trees.  MS-TCN has ~330 parameter leaves (80 layers x 4 tensors)
# and per-leaf elementwise update ops measured 3.3 ms of a 23.8 ms train
# step (docs/PERF_NOTES.md); the math is elementwise, so flattening is
# exact.  PVA_FLAT_OPT=0 restores per-leaf state.  Resume bundles record
# their layout (``opt_layout`` key) and the train CLI builds the matching
# optimizer automatically on resume.
FLAT_OPT = os.environ.get("PVA_FLAT_OPT", "1") == "1"


def layout_name(flat: bool | None = None) -> str:
    """Canonical name of an optimizer-state layout, as stored in resume
    bundles: ``"flat"`` or ``"per_leaf"``."""
    if flat is None:
        flat = FLAT_OPT
    return "flat" if flat else "per_leaf"


def flatten_transform(tx: optax.GradientTransformation):
    """Run ``tx`` over a single concatenated vector of all leaves (requires
    a uniform leaf dtype — true for the f32 master params everywhere here).
    Exact for elementwise transforms like Adam."""
    import jax
    import jax.numpy as jnp

    def _flat(tree):
        return jnp.concatenate(
            [l.reshape(-1) for l in jax.tree_util.tree_leaves(tree)])

    def init(params):
        return tx.init(_flat(params))

    def update(grads, state, params=None):
        leaves, treedef = jax.tree_util.tree_flatten(grads)
        fu, state = tx.update(
            _flat(grads), state, None if params is None else _flat(params))
        outs, off = [], 0
        for l in leaves:
            outs.append(fu[off:off + l.size].reshape(l.shape))
            off += l.size
        return jax.tree_util.tree_unflatten(treedef, outs), state

    return optax.GradientTransformation(init, update)


def make_optimizer(lr: float, lr_step_size: int, lr_gamma: float,
                   flat: bool | None = None):
    """Returns an optax transform whose lr is ``lr * gamma^(epoch//step)``,
    where 'epoch' is supplied via ``set_epoch``-style scale updates.

    ``flat`` overrides the ``PVA_FLAT_OPT`` state-layout default (used when
    resuming a bundle saved under the other layout)."""

    def lr_for_epoch(epoch: int) -> float:
        if lr_step_size > 0 and lr_gamma < 1:
            return lr * (lr_gamma ** (epoch // lr_step_size))
        return lr

    tx = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8
    )
    if FLAT_OPT if flat is None else flat:
        tx = flatten_transform(tx)
    return tx, lr_for_epoch


def set_lr(opt_state, new_lr: float):
    """Update the injected learning rate in-place in the optimizer state."""
    import jax.numpy as jnp

    cur = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        new_lr, dtype=getattr(cur, "dtype", jnp.float32)
    )
    return opt_state
