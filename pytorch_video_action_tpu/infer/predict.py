"""Batched device-side frame prediction for the inference drivers.

The reference runs every video through every model at batch 1 on the fly
(``inference.py:113-122``).  Here videos are grouped into length buckets and
batched through one jitted forward per model; argmax/max reductions happen
on-device and only ``[T]``-sized results come back to host — the voting /
beam-search decoding then runs on host exactly like the reference.
"""

from __future__ import annotations

from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from .. import N_FEAT
from ..data.collate import bucket_length
from ..models import ModelDef


def frame_predictions(
    model: ModelDef,
    params,
    features: list[np.ndarray],
    bucket_multiple: int = 128,
    batch_size: int = 8,
    dropout_at_test: bool = False,
    seed: int = 0,
    sharding=None,
    dtype: str | None = None,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Per video: (predicted_class [T] i64, max_log_prob [T] f32).

    ``max_log_prob`` is the per-frame maximum over classes of the model
    output — the reference's ``_`` from ``torch.max(outputs.data, 1)``
    (``inference.py:123``), used for its normalized-confidence statistic.

    ``dropout_at_test`` reproduces the reference ``inference.py`` quirk of
    never calling ``net.eval()`` (``inference.py:100`` is commented out), so
    dropout stays active during prediction — gated behind ``--parity_quirks``.

    ``sharding`` (``parallel.DataParallel``) shards each forward batch over
    the mesh's 'data' axis — prediction is embarrassingly data-parallel, so
    the inference drivers scale across chips like the train step.

    ``dtype='bfloat16'`` (``--dtype`` on the inference CLIs) casts params and
    inputs for the forward — +55% measured ms_tcn eval throughput on TPU
    (docs/PERF_NOTES.md); argmax/max reductions stay f32.  Predictions can
    differ from f32 on near-tied frames (documented performance extension,
    not a reference behavior).
    """
    use_dp = sharding is not None and hasattr(sharding, "shard_eval")
    cd = jnp.dtype(dtype) if dtype and dtype != "float32" else None

    def _prep(p, x):
        if cd is not None:
            return (jax.tree.map(lambda a: a.astype(cd), p), x.astype(cd))
        return p, x

    if dropout_at_test:
        key = jax.random.PRNGKey(seed)

        def fwd_(p, x, l, r):
            p, x = _prep(p, x)
            return model.apply(p, x, l, train=True, rng=r).astype(jnp.float32)

        fwd = jax.jit(fwd_)
    else:

        def fwd_(p, x, l):
            p, x = _prep(p, x)
            return model.apply(p, x, l, train=False).astype(jnp.float32)

        fwd = jax.jit(fwd_)
    if use_dp:
        params = sharding.replicate(params)

    buckets: dict[int, list[int]] = defaultdict(list)
    for i, f in enumerate(features):
        buckets[bucket_length(len(f), bucket_multiple)].append(i)

    results: list = [None] * len(features)
    for t_pad, idxs in sorted(buckets.items()):
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s : s + batch_size]
            b = len(chunk)
            x = np.zeros((b, t_pad, N_FEAT), dtype=np.float32)
            lengths = np.zeros((b,), dtype=np.int32)
            for j, vi in enumerate(chunk):
                f = np.asarray(features[vi], dtype=np.float32)
                x[j, : len(f)] = f
                lengths[j] = len(f)
            orig_b = b
            if use_dp:
                x_d, l_d, orig_b = sharding.shard_eval(x, lengths)
            else:
                x_d, l_d = jnp.asarray(x), jnp.asarray(lengths)
            if dropout_at_test:
                key, sub = jax.random.split(key)
                out = fwd(params, x_d, l_d, sub)
            else:
                out = fwd(params, x_d, l_d)
            out = out[:orig_b]
            preds = np.asarray(jnp.argmax(out, axis=-1))
            maxp = np.asarray(jnp.max(out, axis=-1))
            for j, vi in enumerate(chunk):
                l = int(lengths[j])
                results[vi] = (preds[j, :l].astype(np.int64), maxp[j, :l])
    return results
