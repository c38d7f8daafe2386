"""Training driver: jitted train step, epoch loop, evaluation.

Mirrors the reference training semantics (``train.py:293-349``) on a
TPU-native execution model: one jitted, shardable train step per bucket shape
(bounded XLA compile count), device-side forward/backward, host-side decoding
and metrics.  Evaluation batches dev videos (the reference runs batch-1,
``train.py:213-215``) — per-video metrics are unchanged, throughput is not.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import TARGET_PAD
from ..models import ModelDef
from ..utils.runlength import run_length_segments
from .losses import make_loss_fn, prepare_ctc_targets
from .optim import make_optimizer, set_lr


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    model_state: Any = None  # BatchNorm running stats (bilstm_lm only)
    rng: Any = None
    epoch: int = 0


class Trainer:
    """Owns the jitted step for one model.

    ``sharding`` (optional): a ``parallel.DataParallel``-style object with
    ``shard_batch(arrays) -> arrays`` and ``replicate(tree) -> tree`` used to
    lay out inputs/params over a device mesh.
    """

    def __init__(
        self,
        model: ModelDef,
        n_class: int,
        lr: float = 1e-3,
        lr_step_size: int = 30,
        lr_gamma: float = 1.0,
        seed: int = 0,
        sharding=None,
        compute_dtype=None,
        opt_flat: bool | None = None,
    ):
        """``compute_dtype`` (e.g. ``jnp.bfloat16`` or ``'bfloat16'``) enables
        mixed-precision training: master params, optimizer state, softmax and
        loss stay float32; the model body (matmuls, scans, convs) runs in the
        compute dtype — the standard TPU recipe (MXU is natively bf16)."""
        self.model = model
        self.n_class = n_class
        self.is_ctc = model.name == "ctcloss"
        self.loss_fn = make_loss_fn(model.name, n_class)
        # opt_flat: optimizer-state layout override (None -> PVA_FLAT_OPT);
        # the CLI passes the layout recorded in a resume bundle here
        from .optim import layout_name

        self.tx, self.lr_for_epoch = make_optimizer(
            lr, lr_step_size, lr_gamma, flat=opt_flat)
        self.opt_layout = layout_name(opt_flat)
        self.sharding = sharding
        self.compute_dtype = (
            jnp.dtype(compute_dtype) if compute_dtype is not None else None
        )
        self._step = self._build_step()
        self._rng0 = jax.random.PRNGKey(seed)

    def init_state(self, params=None, model_state=None) -> TrainState:
        if params is None:
            init = self.model.init(self._rng0)
            if self.model.stateful:
                params, model_state = init
            else:
                params = init
        opt_state = self.tx.init(params)
        if self.sharding is not None:
            params = self.sharding.replicate(params)
            opt_state = self.sharding.replicate(opt_state)
            if model_state is not None:
                model_state = self.sharding.replicate(model_state)
        return TrainState(params, opt_state, model_state, self._rng0)

    def _build_step(self):
        model = self.model
        loss_fn = self.loss_fn
        tx = self.tx
        is_ctc = self.is_ctc
        stateful = model.stateful

        cd = self.compute_dtype

        def cast_tree(tree):
            return jax.tree.map(
                lambda a: a.astype(cd)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                tree,
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, model_state, x, lengths, targets, rng, ctc_t, ctc_tl):
            def compute_loss(p):
                # mixed precision: cast params+inputs for the body; grads flow
                # back to the float32 master params through the cast
                p_c = cast_tree(p) if cd is not None else p
                x_c = x.astype(cd) if cd is not None else x
                if stateful:
                    out, new_ms = model.apply(
                        p_c, x_c, lengths, train=True, rng=rng, state=model_state
                    )
                else:
                    out = model.apply(p_c, x_c, lengths, train=True, rng=rng)
                    new_ms = model_state
                out = out.astype(jnp.float32)
                if is_ctc:
                    loss = loss_fn(out, lengths, ctc_t, ctc_tl)
                else:
                    loss = loss_fn(out, targets)
                return loss, new_ms

            (loss, new_ms), grads = jax.value_and_grad(compute_loss, has_aux=True)(
                params
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, new_ms, loss

        return step

    def prepare_batch(self, batch) -> tuple:
        """Host batch -> device-resident step inputs.

        Separated from :meth:`train_step` so callers can cache the prepared
        (device) batches across epochs — the reference sampler freezes batch
        COMPOSITION for the whole run (``data_utils.py:57-60``), so per-epoch
        re-transfer is pure waste.  Under the bf16 policy the features are
        converted on host first: half the host->device bytes (the e2e
        bottleneck on interconnect-limited setups)."""
        x, lengths, targets, _ = batch
        if self.is_ctc:
            ctc_t, ctc_tl = prepare_ctc_targets(targets, x.shape[0])
        else:
            ctc_t = ctc_tl = np.zeros((x.shape[0], 1), np.int32)
        if self.compute_dtype is not None:
            import ml_dtypes

            x = np.asarray(x).astype(ml_dtypes.bfloat16)
        if self.sharding is not None:
            return self.sharding.shard_batch(x, lengths, targets, ctc_t, ctc_tl)
        return (
            jnp.asarray(x),
            jnp.asarray(lengths),
            jnp.asarray(targets),
            jnp.asarray(ctc_t),
            jnp.asarray(ctc_tl),
        )

    def train_step(self, ts: TrainState, batch) -> float:
        if isinstance(batch, tuple) and len(batch) == 5:
            x, lengths, targets, ctc_t, ctc_tl = batch  # already prepared
        else:
            x, lengths, targets, ctc_t, ctc_tl = self.prepare_batch(batch)
        ts.rng, sub = jax.random.split(ts.rng)
        ts.params, ts.opt_state, ts.model_state, loss = self._step(
            ts.params,
            ts.opt_state,
            ts.model_state,
            jnp.asarray(x),
            jnp.asarray(lengths),
            jnp.asarray(targets),
            sub,
            jnp.asarray(ctc_t),
            jnp.asarray(ctc_tl),
        )
        return loss

    def start_epoch(self, ts: TrainState) -> None:
        set_lr(ts.opt_state, self.lr_for_epoch(ts.epoch))


# ------------------------------------------------------------------ evaluate


def _forward_eval(model: ModelDef, params, model_state, x, lengths):
    if model.stateful:
        out, _ = model.apply(
            jax.device_put(params), jnp.asarray(x), jnp.asarray(lengths),
            train=False, state=model_state,
        )
    else:
        out = model.apply(params, jnp.asarray(x), jnp.asarray(lengths), train=False)
    return out


def predict_batches(model: ModelDef, params, feed, model_state=None,
                    sharding=None):
    """Yield per-video (pred_frames, label_frames) pairs over a BatchFeed.

    ``sharding``: an object with ``shard_eval(x, lengths)`` +
    ``replicate(tree)`` (``parallel.DataParallel``) — the forward then runs
    with the batch axis sharded over the mesh (padded rows sliced off), so
    the per-epoch dev pass rides the same devices as the train step.
    SP-wrapped models shard internally (their ``apply`` pads B/T itself) and
    need no ``sharding`` here.
    """
    # the jitted eval forward lives ON the ModelDef (an id()-keyed dict would
    # hand a recycled id the previous model's compiled apply)
    use_dp = sharding is not None and hasattr(sharding, "shard_eval") \
        and not model.stateful
    fwd = getattr(model, "_eval_fwd", None)
    if fwd is None and not model.stateful:
        fwd = jax.jit(lambda p, x, l: model.apply(p, x, l, train=False))
        model._eval_fwd = fwd
    if use_dp:
        params = sharding.replicate(params)
    for x, lengths, targets, mask in feed:
        b, t = x.shape[0], x.shape[1]
        if use_dp:
            x_d, l_d, orig_b = sharding.shard_eval(x, lengths)
            out = np.asarray(fwd(params, x_d, l_d))[:orig_b]
        elif fwd is not None:
            out = fwd(params, jnp.asarray(x), jnp.asarray(lengths))
        else:
            out = _forward_eval(model, params, model_state, x, lengths)
        out = np.asarray(out)
        preds = out.argmax(axis=-1)
        tgt = np.asarray(targets).reshape(b, -1)
        frame_level = preds.ndim == 2
        for i in range(b):
            if frame_level:
                l = int(lengths[i]) if tgt.shape[1] > 1 else tgt.shape[1]
                yield preds[i, :l], tgt[i, :l]
            else:
                yield preds[i : i + 1], tgt[i, :1]


def evaluate(model: ModelDef, params, feed, model_state=None,
             sharding=None) -> tuple[float, float]:
    """(segment_accuracy, frame_accuracy) in percent — reference ``evaluate``
    (``train.py:143-176``): frame argmax accuracy + per-ground-truth-segment
    majority vote (bincount argmax, lowest index on ties).  ``sharding``
    data-parallelizes the forward (identical metrics, tested)."""
    correct_frame = total_frame = 0
    correct_segment = total_segment = 0
    for pred, labels in predict_batches(model, params, feed, model_state,
                                        sharding=sharding):
        valid = labels != TARGET_PAD
        pred, labels = pred[valid], labels[valid]
        if labels.size == 0:
            continue
        total_frame += labels.size
        correct_frame += int((pred == labels).sum())
        seg_labels, bounds = run_length_segments(labels)
        for k, seg_label in enumerate(seg_labels):
            seg_pred = pred[bounds[k] : bounds[k + 1]]
            if seg_pred.size == 0:
                continue
            vote = int(np.bincount(seg_pred).argmax())
            if int(seg_label) == vote:
                correct_segment += 1
        total_segment += len(seg_labels)
    frame_acc = 100.0 * correct_frame / max(total_frame, 1)
    seg_acc = 100.0 * correct_segment / max(total_segment, 1)
    return seg_acc, frame_acc
