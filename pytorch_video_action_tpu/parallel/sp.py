"""Sequence (context) parallelism for time-local models.

The reference handles long videos (thousands of frames) by brute force on one
device (SURVEY.md §5 long-context row).  TPU-native design: shard the time
axis over the ``seq`` mesh axis and exchange halos between neighbor shards
with ``lax.ppermute`` over ICI.  MS-TCN is the natural client: every op is
either pointwise or a 3-tap dilated conv, and a dilated conv tap at distance
``d`` is exactly a zero-padded global shift of the time axis:

    out[t] = w0 @ x[t-d] + w1 @ x[t] + w2 @ x[t+d]

``global_shift_time`` implements x[t±d] for *any* d (even d >= local block
length, which MS-TCN's 2^19 dilations produce) as at most two ppermutes —
whole-block rotation plus boundary-chunk exchange — with automatic zero fill
at the sequence ends (ppermute zero-fills non-covered destinations).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ppermute_blocks(x, axis_name: str, block_shift: int):
    """Rotate whole local blocks ``block_shift`` steps along the device ring
    (no wraparound: out-of-range destinations receive zeros)."""
    n = lax.axis_size(axis_name)
    if block_shift == 0:
        return x
    perm = [
        (src, src + block_shift)
        for src in range(n)
        if 0 <= src + block_shift < n
    ]
    if not perm:
        return jnp.zeros_like(x)
    return lax.ppermute(x, axis_name, perm)


def global_shift_time(x: jax.Array, shift: int, axis_name: str = "seq") -> jax.Array:
    """Inside ``shard_map`` over ``axis_name``: returns y with
    ``y_global[t] = x_global[t - shift]`` (zeros beyond the ends), where the
    global time axis is axis 1 of the local block ``[B, T_loc, C]``.
    """
    t_loc = x.shape[1]
    if shift == 0:
        return x
    if shift > 0:
        # y_local of shard i = tail of shard i-k-1 ++ head of shard i-k
        k, r = divmod(shift, t_loc)
        near = _ppermute_blocks(x, axis_name, k)       # shard i-k's block
        far = _ppermute_blocks(x, axis_name, k + 1)    # shard i-k-1's block
        if r == 0:
            return near
        return jnp.concatenate(
            [far[:, t_loc - r :, :], near[:, : t_loc - r, :]], axis=1
        )
    k, r = divmod(-shift, t_loc)
    near = _ppermute_blocks(x, axis_name, -k)
    far = _ppermute_blocks(x, axis_name, -(k + 1))
    if r == 0:
        return near
    return jnp.concatenate([near[:, r:, :], far[:, :r, :]], axis=1)


def sp_dilated_conv3(w: jax.Array, b: jax.Array, x: jax.Array, dilation: int,
                     axis_name: str = "seq") -> jax.Array:
    """'same'-padded 3-tap dilated conv on a time-sharded block.
    ``w [3, Cin, Cout]``; taps become halo shifts + MXU matmuls."""
    left = global_shift_time(x, dilation, axis_name)    # x[t - d]
    right = global_shift_time(x, -dilation, axis_name)  # x[t + d]
    return left @ w[0] + x @ w[1] + right @ w[2] + b


def _sp_mask(lengths: jax.Array, t_loc: int, axis_name: str = "seq") -> jax.Array:
    """Frame-validity mask for the local time block, using the global frame
    index ``axis_index * T_loc + local_t``."""
    offset = lax.axis_index(axis_name) * t_loc
    t_idx = offset + jnp.arange(t_loc, dtype=jnp.int32)
    return (t_idx[None, :] < lengths[:, None]).astype(jnp.float32)[:, :, None]


def mstcn_forward_sp(params, cfg, x: jax.Array, lengths: jax.Array,
                     mesh: Mesh, *, train: bool = False, rng=None) -> jax.Array:
    """Sequence-parallel MS-TCN forward: batch over 'data', time over 'seq'.

    Semantically identical to ``models.mstcn.apply`` (tested); the dilated
    convs ride ICI halo exchanges instead of materializing the full sequence
    per device.
    """
    from ..models.mstcn import MSTCNConfig  # noqa: F401 (doc link)

    def local_fn(params, x_loc, lengths):
        t_loc = x_loc.shape[1]
        mask = _sp_mask(lengths, t_loc)

        def stage(stage_params, inp, rng_stage):
            use_dropout = train and rng_stage is not None and cfg.dropout_rate > 0
            if use_dropout:
                # one threefry fold on a scalar decorrelates time shards; the
                # per-layer masks come from the counter-hash stream — the
                # per-layer bernoulli draws this replaces measured +37% step
                # time on the single-chip XLA path (docs/PERF_NOTES.md), and
                # the SP path regenerates masks in the recompute backward the
                # same way
                from ..ops.conv import HASH_DROPOUT
                from ..ops.hashmask import keep_mask, rng_seed_u32, threshold

                keep = 1.0 - cfg.dropout_rate
                if HASH_DROPOUT:
                    seed = rng_seed_u32(
                        jax.random.fold_in(rng_stage, lax.axis_index("seq"))
                    )
            out = inp @ stage_params["conv_in"]["w"][0] + stage_params["conv_in"]["b"]
            for i, layer in enumerate(stage_params["layers"]):
                h = jax.nn.relu(
                    sp_dilated_conv3(
                        layer["conv_dilated"]["w"], layer["conv_dilated"]["b"],
                        out, 2 ** i,
                    )
                )
                h = h @ layer["conv_1x1"]["w"][0] + layer["conv_1x1"]["b"]
                if use_dropout:
                    if HASH_DROPOUT:
                        km = keep_mask(seed, h.shape, threshold(keep), offset=i)
                        h = jnp.where(km, h * (1.0 / keep),
                                      jnp.zeros((), h.dtype))
                    else:
                        sub = jax.random.fold_in(rng_stage, i)
                        # decorrelate dropout across time shards
                        sub = jax.random.fold_in(sub, lax.axis_index("seq"))
                        h = h * jax.random.bernoulli(sub, keep, h.shape) / keep
                out = (out + h) * mask
            return (
                out @ stage_params["conv_out"]["w"][0] + stage_params["conv_out"]["b"]
            ) * mask

        rngs = (
            jax.random.split(rng, cfg.num_stages) if (train and rng is not None)
            else [None] * cfg.num_stages
        )
        out = stage(params["stages"][0], x_loc, rngs[0])
        acc = out
        for s in range(1, cfg.num_stages):
            out = stage(
                params["stages"][s], jax.nn.softmax(out, axis=-1) * mask, rngs[s]
            )
            acc = jnp.maximum(acc, out)
        return acc

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P("data", "seq", None), P("data")),
        out_specs=P("data", "seq", None),
    )(params, x, lengths)


def constrain_time_sharding(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Annotate an activation ``[B, T, C]`` as batch+time sharded and let the
    GSPMD partitioner place the halo collectives (the 'let XLA do it' path,
    vs. the explicit shard_map above)."""
    return lax.with_sharding_constraint(x, NamedSharding(mesh, P("data", "seq", None)))


class SeqDataParallel:
    """Trainer sharding for DP x SP meshes (MS-TCN, SURVEY.md §2.6).

    Batch axis shards over 'data', the time axis over 'seq'; the wrapped
    model forward is the shard_map halo-exchange MS-TCN.  Use via
    ``train.py --model ms_tcn --seq_parallel N [--data_parallel M]`` — the
    CLI wraps the ModelDef with :meth:`wrap_model` and passes this object as
    ``Trainer(sharding=...)``.
    """

    def __init__(self, data: int | None = None, seq: int = 2,
                 mesh: Mesh | None = None):
        from .mesh import make_mesh

        self.mesh = mesh if mesh is not None else make_mesh(data=data, seq=seq)
        self.n_data = self.mesh.shape["data"]
        self.n_seq = self.mesh.shape["seq"]
        self._batch = NamedSharding(self.mesh, P("data"))
        self._batch_time = NamedSharding(self.mesh, P("data", "seq"))
        self._replicated = NamedSharding(self.mesh, P())

    def replicate(self, tree):
        return jax.device_put(tree, self._replicated)

    def wrap_model(self, model_def):
        """ModelDef whose apply runs the sequence-parallel forward
        (MS-TCN: halo-exchange dilated convs; attn: ring attention).

        The wrapped apply pads B/T itself (fully masked rows/frames) so
        callers that bypass :meth:`shard_batch` — the eval path's
        ``predict_batches``, whose batches need not divide the mesh axes —
        still shard cleanly; outputs are sliced back to the caller's shape."""
        from dataclasses import replace

        cfg, mesh = model_def.config, self.mesh
        n_data, n_seq = self.n_data, self.n_seq

        if model_def.name == "attn":
            from .ring import attn_forward_sp

            sp_forward = attn_forward_sp
        else:
            sp_forward = mstcn_forward_sp

        def apply(params, x, lengths, *, train=False, rng=None):
            b, t = x.shape[0], x.shape[1]
            pad_b = (n_data - b % n_data) % n_data
            pad_t = (n_seq - t % n_seq) % n_seq
            if pad_b or pad_t:
                x = jnp.pad(x, ((0, pad_b), (0, pad_t), (0, 0)))
                lengths = jnp.pad(lengths, (0, pad_b))
            out = sp_forward(params, cfg, x, lengths, mesh, train=train,
                             rng=rng)
            if pad_b:
                out = out[:b]
            if pad_t and out.ndim == 3:
                out = out[:, :t]
            return out

        return replace(model_def, apply=apply)

    def shard_batch(self, x, lengths, targets, *rest):
        """Pad B to a 'data' multiple and T to a 'seq' multiple (fully masked
        rows/frames: zero features, -1 targets), then place x with
        ``P('data', 'seq')`` and per-sequence arrays with ``P('data')``."""
        import numpy as np

        from .. import TARGET_PAD

        x = np.asarray(x)
        b, t = x.shape[0], x.shape[1]
        pad_b = (self.n_data - b % self.n_data) % self.n_data
        pad_t = (self.n_seq - t % self.n_seq) % self.n_seq
        tgt = np.asarray(targets).reshape(b, -1)
        frame_level = tgt.shape[1] == t

        if pad_t:
            x = np.pad(x, ((0, 0), (0, pad_t), (0, 0)))
            if frame_level:
                tgt = np.pad(tgt, ((0, 0), (0, pad_t)),
                             constant_values=TARGET_PAD)
        if pad_b:
            x = np.pad(x, ((0, pad_b), (0, 0), (0, 0)))
            lengths = np.pad(np.asarray(lengths), (0, pad_b))
            tgt = np.pad(tgt, ((0, pad_b), (0, 0)), constant_values=TARGET_PAD)
        out = [
            jax.device_put(x, self._batch_time),
            jax.device_put(np.asarray(lengths), self._batch),
            jax.device_put(tgt.reshape(-1), self._replicated),
        ]
        for a in rest:
            a = np.asarray(a)
            if pad_b:
                a = np.pad(a, ((0, pad_b),) + ((0, 0),) * (a.ndim - 1))
            out.append(jax.device_put(a, self._batch))
        return tuple(out)
