"""Loss functions with reference semantics (``train.py:266-271``):

* ``ms_tcn``  -> CrossEntropyLoss(ignore_index=-1) over raw logits,
* ``ctcloss`` -> CTCLoss(blank=n_class, zero_infinity=True),
* everything else -> NLLLoss(ignore_index=-1) over log-softmax outputs.

All are masked means over valid targets, matching torch's default 'mean'
reduction with ``ignore_index`` (sum over valid / count of valid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import TARGET_PAD


def nll_loss(log_probs: jax.Array, targets: jax.Array) -> jax.Array:
    """NLLLoss(ignore_index=-1): inputs ``[N, C]`` log-probs, ``[N]`` targets.

    The target pick is a one-hot masked SUM, not ``take_along_axis``: TPUs
    run row gathers near-serially — the gather fusion measured 0.54 ms of
    the 5.86 ms bigru train step for touching 1 MB (trace source
    ``jvp(take_along_axis)/gather``, docs/PERF_NOTES.md round 4) — while
    the one-hot compare+select+reduce is a single VPU sweep over ``[N, C]``
    that fuses with the upstream log-softmax, and its VJP is a broadcast
    multiply instead of a scatter (so the backward is gather-free too).
    """
    log_probs = log_probs.reshape(-1, log_probs.shape[-1])
    targets = targets.reshape(-1)
    valid = targets != TARGET_PAD
    safe_t = jnp.where(valid, targets, 0)
    hot = (
        jnp.arange(log_probs.shape[-1], dtype=safe_t.dtype)[None, :]
        == safe_t[:, None]
    )
    picked = jnp.where(hot, log_probs, 0.0).sum(axis=-1)
    picked = jnp.where(valid, picked, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    return -picked.sum() / count


def cross_entropy_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """CrossEntropyLoss(ignore_index=-1) over raw logits."""
    return nll_loss(jax.nn.log_softmax(logits, axis=-1), targets)


def ctc_loss(
    log_probs: jax.Array,
    input_lengths: jax.Array,
    targets: jax.Array,
    target_lengths: jax.Array,
    blank_id: int,
) -> jax.Array:
    """torch-style CTC mean reduction: per-sequence NLL divided by target
    length, averaged over the batch.

    ``log_probs [B, T, K]``; ``targets [B, L]`` zero-padded.
    """
    b, t, _ = log_probs.shape
    logit_pads = (
        jnp.arange(t, dtype=jnp.int32)[None, :] >= input_lengths[:, None]
    ).astype(jnp.float32)
    l = targets.shape[1]
    label_pads = (
        jnp.arange(l, dtype=jnp.int32)[None, :] >= target_lengths[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        log_probs, logit_pads, targets, label_pads, blank_id=blank_id
    )
    denom = jnp.maximum(target_lengths.astype(log_probs.dtype), 1)
    per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)  # zero_infinity=True
    return jnp.mean(per_seq / denom)


def prepare_ctc_targets(labels_flat: np.ndarray, batch: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side CTC target prep: per-video ``unique_consecutive`` collapse of
    frame labels (reference ``train.py:311-323``), excluding the -1 padding
    (the reference feeds pads through at batch > 1 — a bug not preserved).
    Returns zero-padded ``targets [B, L_max]`` and ``target_lengths [B]``.
    """
    rows = np.asarray(labels_flat).reshape(batch, -1)
    collapsed = []
    for row in rows:
        row = row[row != TARGET_PAD]
        if row.size == 0:
            collapsed.append(np.zeros((0,), dtype=np.int64))
            continue
        keep = np.ones(len(row), dtype=bool)
        keep[1:] = row[1:] != row[:-1]
        collapsed.append(row[keep])
    max_l = max((len(c) for c in collapsed), default=1) or 1
    targets = np.zeros((batch, max_l), dtype=np.int64)
    lengths = np.zeros((batch,), dtype=np.int32)
    for i, c in enumerate(collapsed):
        targets[i, : len(c)] = c
        lengths[i] = len(c)
    return targets, lengths


def make_loss_fn(model_name: str, n_class: int):
    """Loss selector mirroring ``train.py:266-271``."""
    if model_name in ("ms_tcn", "mstcn"):
        return cross_entropy_loss
    if model_name == "ctcloss":
        def fn(log_probs, input_lengths, targets, target_lengths):
            return ctc_loss(log_probs, input_lengths, targets, target_lengths, n_class)
        return fn
    return nll_loss
