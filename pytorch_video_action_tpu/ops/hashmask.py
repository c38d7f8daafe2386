"""Counter-based dropout masks: murmur3-fmix32 over element indices.

Threefry (``jax.random.bernoulli``) costs ~20+ VPU ops per word; for dropout
masks regenerated in BOTH the forward and the recompute backward that is
real step time (measured 13.7 ms of a 40 ms attn train step at B=4, T=4096
— docs/PERF_NOTES.md).  fmix32 is ~7 integer ops with full avalanche —
ample for Bernoulli keep-masks — and, unlike ``pltpu.prng_random_bits``,
bitwise identical under XLA, Pallas and interpret mode, so Pallas kernels
and their XLA recompute backwards can share mask streams (ops/conv_pallas.py
uses the same construction in-kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

GOLDEN = 0x9E3779B9


def threshold(keep: float) -> int:
    """uint32 compare threshold such that P(fmix32(x) < threshold) == keep."""
    return min(0xFFFFFFFF, int(round(keep * 2.0 ** 32)))


def fmix32(h):
    """murmur3 finalizer: full avalanche, constant shifts only."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def rng_seed_u32(rng) -> jax.Array:
    """Collapse a JAX PRNG key (typed or raw uint32 vector) to one uint32."""
    try:
        if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
            rng = jax.random.key_data(rng)
    except TypeError:
        pass
    data = jnp.asarray(rng).astype(jnp.uint32).reshape(-1)
    seed = data[0]
    for i in range(1, int(data.shape[0])):
        seed = seed ^ (data[i] * jnp.uint32(GOLDEN))
    return seed


def keep_mask(seed_u32, shape, thresh: int, offset=None, strides=None):
    """iid-Bernoulli(keep) boolean mask over ``shape`` (static, any rank).

    Element index is the linear row-major position; ``offset`` (Python int
    or traced scalar) selects an independent stream, e.g. ``offset=step``
    gives per-block streams that the backward regenerates exactly.

    ``strides`` (per-axis Python ints) overrides the index computation for
    tensors held in a layout other than the stream's canonical one — e.g. a
    TIME-major ``[T, B, C]`` view of a batch-major stream passes
    ``strides=(C, T*C, 1)`` and every element draws the same mask bit it
    would in ``[B, T, C]`` row-major order (tests/test_rnn_stack_tm.py).
    The default is row-major over ``shape`` (unchanged behavior).

    The (seed, offset) pair is avalanched into a scalar key BEFORE touching
    the counter (one extra scalar fmix32, free per mask).  Folding them in
    additively — ``idx + seed*GOLDEN`` — made every stream a shifted copy of
    one global sequence, so two seeds whose delta*GOLDEN mod 2^32 was small
    produced identical masks over the overlap (advisor finding, round 2).
    XORing the avalanched key into the counter makes distinct keys
    index-permuted (not shifted) variants: no contiguous identical runs.
    """
    key = jnp.uint32(seed_u32)
    if offset is not None:
        if isinstance(offset, int):  # avoid int32 overflow in asarray
            off = jnp.uint32(offset & 0xFFFFFFFF)
        else:
            off = jnp.asarray(offset).astype(jnp.uint32)
        key = key ^ off * jnp.uint32(0x85EBCA77)
    # scalar avalanche; + GOLDEN keeps seed=0/offset=None off fmix32's
    # fixed point at 0 (fmix32(0) == 0 would expose the raw counter stream)
    key = fmix32(key + jnp.uint32(GOLDEN))
    if strides is None:
        strides = []
        stride = 1
        for axis in range(len(shape) - 1, -1, -1):
            strides.append(stride)
            stride *= shape[axis]
        strides = strides[::-1]
    idx = jnp.zeros(shape, jnp.uint32)
    for axis in range(len(shape) - 1, -1, -1):
        idx = idx + lax.broadcasted_iota(jnp.uint32, shape, axis) * jnp.uint32(
            strides[axis] & 0xFFFFFFFF)
    return fmix32(idx ^ key) < jnp.uint32(thresh)


def packed_exact(keep: float) -> bool:
    """True when ``keep`` is exactly representable at byte granularity, i.e.
    ``keep_mask8`` draws Bernoulli(keep) exactly (p=0.5 -> 128/256)."""
    return abs(keep * 256 - round(keep * 256)) < 1e-9 and 0 < round(keep * 256) <= 256


def keep_mask8(seed_u32, shape, keep: float, offset=None):
    """``keep_mask`` with 4 Bernoulli samples per hash word (byte compare).

    One fmix32 avalanche yields 32 bits; the murmur3 finalizer's bytes are
    individually uniform and pairwise decorrelated (asserted in
    tests/test_hashmask.py), so comparing each byte against
    ``round(keep*256)`` gives 4 iid keep-bits per word — ~2x fewer VPU ops
    per mask element than the word stream.  MEASURED SLOWER than the word
    stream on the ms_tcn step (the byte expansion relayouts the last axis
    across vector lanes — tools/ab_mstcn_bwd.py) and therefore NOT used by
    default anywhere; kept behind ``PVA_PACKED_MASKS`` as an escape hatch.
    Exact only when ``keep*256`` is integral (``packed_exact``); callers
    gate on that and fall back to ``keep_mask`` otherwise.  Stream is distinct from ``keep_mask``'s (byte
    lanes vs whole words) — both are deterministic in (seed, offset), which
    is the property recompute backwards rely on.

    The last axis must be divisible by 4 (true for every production shape:
    C=64 conv activations, 128-lane attention tiles)."""
    *lead, last = shape
    assert last % 4 == 0, shape
    words_shape = (*lead, last // 4, 1)
    key = jnp.uint32(seed_u32)
    if offset is not None:
        if isinstance(offset, int):
            off = jnp.uint32(offset & 0xFFFFFFFF)
        else:
            off = jnp.asarray(offset).astype(jnp.uint32)
        key = key ^ off * jnp.uint32(0x85EBCA77)
    key = fmix32(key + jnp.uint32(GOLDEN))
    idx = jnp.zeros(words_shape, jnp.uint32)
    stride = 1
    for axis in range(len(words_shape) - 2, -1, -1):
        idx = idx + lax.broadcasted_iota(jnp.uint32, words_shape, axis) * jnp.uint32(stride)
        stride *= words_shape[axis]
    w = fmix32(idx ^ key)
    shifts = jnp.arange(4, dtype=jnp.uint32).reshape((1,) * len(lead) + (1, 4))
    bytes_ = (w >> (shifts * jnp.uint32(8))) & jnp.uint32(0xFF)
    tb = jnp.uint32(int(round(keep * 256)))
    return (bytes_ < tb).reshape(shape)


# Model-body dropout (input dropout + RNN inter-layer dropout in
# models/common.py and ops/rnn.py) on the hash stream instead of threefry.
# The round-2 "bigru no-gain (masks hide in scan bubbles)" result was
# measured on the dispatch-polluted methodology and pre-dates the fused
# layer kernels; the round-4 profile showed ~3.9 ms of threefry in the
# 26.9 ms bigru step (docs/PERF_NOTES.md).  PVA_MODEL_HASH_DROPOUT=0
# restores threefry.
import os as _os

MODEL_DROPOUT = _os.environ.get("PVA_MODEL_HASH_DROPOUT", "1") == "1"


def hash_dropout(rng, x, keep: float):
    """Inverted dropout drawing the keep-mask from the counter-hash stream
    (one fmix32 word per element, seeded from ``rng``) — the same stream
    the conv/flash/SP paths use."""
    km = keep_mask(rng_seed_u32(rng), x.shape, threshold(keep))
    return jnp.where(km, x * (1.0 / keep), jnp.zeros((), x.dtype))
