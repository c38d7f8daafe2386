"""Length-masking primitives shared by every model.

The reference handles variable lengths with ``pack_padded_sequence`` /
``pad_packed_sequence`` (``networks.py:40-43``).  On TPU we keep fixed shapes
and mask explicitly: padded frames are zeros, recurrent carries freeze on
padded steps, and pooled statistics are computed over valid frames only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def length_mask(lengths: jax.Array, t: int) -> jax.Array:
    """``[B, T]`` boolean validity mask from per-sequence lengths."""
    return jnp.arange(t, dtype=jnp.int32)[None, :] < lengths[:, None]


def masked_reverse(x: jax.Array, lengths: jax.Array) -> jax.Array:
    """Reverse each sequence's valid prefix along time, zeros stay at the tail.

    ``out[b, t] = x[b, len_b - 1 - t]`` for ``t < len_b`` else 0.  Applying it
    twice is the identity on valid frames.  This is how a reverse-direction
    RNN scan sees frames in true reverse order regardless of padding.
    """
    b, t = x.shape[0], x.shape[1]
    idx = lengths[:, None] - 1 - jnp.arange(t, dtype=jnp.int32)[None, :]
    valid = idx >= 0
    idx = jnp.clip(idx, 0, t - 1)
    gathered = jnp.take_along_axis(
        x, idx.reshape(b, t, *([1] * (x.ndim - 2))).astype(jnp.int32), axis=1
    )
    return jnp.where(valid.reshape(b, t, *([1] * (x.ndim - 2))), gathered, 0)


def take_last_valid(x: jax.Array, lengths: jax.Array) -> jax.Array:
    """``x[b, len_b - 1]`` — the last *valid* timestep per sequence.

    The reference's ``mode == 'last'`` takes ``out[:, -1]`` (``networks.py:44-46``)
    which equals the last valid step under its exact-length bucketing; with
    bucket-rounded padding the true last step is the faithful semantics.
    """
    idx = jnp.clip(lengths - 1, 0, x.shape[1] - 1)
    return jnp.take_along_axis(
        x, idx.reshape(-1, 1, *([1] * (x.ndim - 2))).astype(jnp.int32), axis=1
    ).squeeze(1)


def masked_mean(x: jax.Array, mask: jax.Array, axis: int = 1) -> jax.Array:
    """Mean over valid frames (reference ``mode == 'avg'`` under exact bucketing)."""
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    total = jnp.sum(x * m, axis=axis)
    count = jnp.maximum(jnp.sum(m, axis=axis), 1)
    return total / count


def apply_mask(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    return x * m
