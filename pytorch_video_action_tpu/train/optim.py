"""Optimizer: Adam + StepLR-equivalent schedule.

Reference (``train.py:273-274``): ``Adam(lr, betas=(0.9, 0.999), eps=1e-8)``
with ``StepLR(step_size, gamma)`` stepped once per epoch, and only when
``lr_step_size > 0 and lr_gamma < 1`` (``train.py:334-335``).

The schedule is driven by an epoch counter fed from the train loop, so the
jitted train step never retraces on learning-rate changes.
"""

from __future__ import annotations

import optax


def make_optimizer(lr: float, lr_step_size: int, lr_gamma: float):
    """Returns an optax transform whose lr is ``lr * gamma^(epoch//step)``,
    where 'epoch' is supplied via ``set_epoch``-style scale updates."""

    def lr_for_epoch(epoch: int) -> float:
        if lr_step_size > 0 and lr_gamma < 1:
            return lr * (lr_gamma ** (epoch // lr_step_size))
        return lr

    tx = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8
    )
    return tx, lr_for_epoch


def set_lr(opt_state, new_lr: float):
    """Update the injected learning rate in-place in the optimizer state."""
    import jax.numpy as jnp

    cur = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        new_lr, dtype=getattr(cur, "dtype", jnp.float32)
    )
    return opt_state
