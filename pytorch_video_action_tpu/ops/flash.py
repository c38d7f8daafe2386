"""Memory-efficient exact self-attention with a FlashAttention-style
custom VJP — the TRAINING path for long videos.

The reference trains its ``attn`` model on whole videos
(``/root/reference/networks.py:186-203``; Breakfast reaches 4k+ frames), which
materializes the dense ``[B, H, T, T]`` score tensor twice (forward + VJP
residual).  This module keeps both passes O(T * block):

* **forward**: online-softmax fold over KV blocks (``lax.scan``) producing the
  attention output and the per-row log-sum-exp ``lse = m + log l``.
* **backward**: the FlashAttention recompute — per KV block, rebuild the
  normalized probabilities ``p = exp(s - lse)`` and use the identity
  ``sum_k g_k p_k = dout . out  (=: delta)`` to apply the softmax Jacobian
  without ever holding a full ``[T, T]`` matrix.

Attention-matrix **dropout** (the reference applies
``nn.MultiheadAttention(dropout=...)``'s post-softmax dropout in training)
is exact: the keep-mask multiplies the softmax NUMERATOR only (the
denominator is dropout-free, matching ``dropout(softmax(s)) @ v``), and each
KV block regenerates its mask from ``fold_in(rng, block_index)`` — identical
in forward and backward, so the VJP is exact for the sampled mask.  The
``delta`` identity still holds under dropout because
``out = sum_k p_k m~_k v_k`` (see ``_flash_bwd``).

Fully-masked query rows (bucket padding) emit zeros with zero gradients;
downstream masking discards them either way.

Mixed precision: the QK/PV matmuls follow the INPUT dtype (pass bf16 q/k/v
for MXU-rate bf16), while the online-softmax state (m, l, acc) and the lse
are always f32 — the caller opts into bf16, the kernel guarantees softmax
numerics.  The backward recompute may run a different KV block size
(``PVA_FLASH_BLOCK_BWD``): dropout masks are keyed by global kv column, not
block index, so any partitioning regenerates the identical sampled mask.

Verified against the dense path (values + grads) and against plain autodiff
through the same blockwise computation (dropout on) in
``tests/test_pallas_kernels.py``/``tests/test_model_parity.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _env_block(name: str, default: int) -> int:
    """Parse + validate a block-size override (advisor finding r3: an
    unvalidated 0/negative reached the reshape deep in the scan with an
    opaque error)."""
    import os

    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(f"{name}={raw!r} is not an integer") from None
    if val < 1:
        raise ValueError(f"{name} must be >= 1, got {val}")
    return val


# KV block length for the flash scan, set by interleaved A/B on the B=4,
# T=4096 train step (tools/ab_flash_block.py): 64 -> 18.65 ms/step vs 512
# (the round-2 default, tuned under the dispatch-polluted roofline) ->
# 23.11 ms.  Small [B, H, T, c] score tiles keep the exp/mask/einsum chain
# cache-resident; 64/128/256 sit within ~5%, >=512 monotonically loses.
DEFAULT_BLOCK = _env_block("PVA_FLASH_BLOCK", 64)
# The backward recompute may use its OWN block size (fwd/bwd have different
# working sets: bwd holds dout/delta and emits dk/dv per block).  Dropout
# masks are keyed by GLOBAL kv column (not block index), so differing
# fwd/bwd partitions regenerate identical masks and the VJP stays exact.
BWD_BLOCK = _env_block("PVA_FLASH_BLOCK_BWD", 0) or None


def _use_pallas() -> bool:
    """Route through the query/KV-tiled Pallas kernels
    (``ops/flash_pallas``)?  Default ON on TPU: with the fused single-pass
    backward and (512, 1024) tiles the kernels measure +28% on the
    isolated flash fwd+bwd and +8.7% on the full attn train step vs the
    XLA blockwise scan (tools/ab_flash_micro.py / ab_flash_pallas.py,
    docs/PERF_NOTES.md).  Read at trace time (not import), so drivers may
    flip ``PVA_FLASH_PALLAS`` after importing models; on CPU ``=1`` runs
    the kernels in interpret mode (tests)."""
    import os

    flag = os.environ.get("PVA_FLASH_PALLAS")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() == "tpu"


def _pallas_shapes(q):
    """[B, H, T, d] -> ([BH, T, d128], pad) merge + lane-pad for the kernel;
    zero d-padding is exact through every matmul (QK adds zero products, PV
    emits zero columns that the caller slices off)."""
    b, h, t, d = q.shape
    dp = (128 - d % 128) % 128
    q = q.reshape(b * h, t, d)
    if dp:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, dp)))
    return q


def _pallas_seed(rng, use_dropout):
    from .hashmask import GOLDEN, fmix32, rng_seed_u32

    if not use_dropout:
        return jnp.zeros((1,), jnp.uint32)
    key = fmix32(jnp.uint32(rng_seed_u32(rng)) + jnp.uint32(GOLDEN))
    return key.reshape(1)


def _flash_fwd_pallas(q, k, v, key_mask, dropout_rate, rng):
    from . import flash_pallas as fp

    b, h, t, d = q.shape
    use_dropout = dropout_rate > 0.0 and rng is not None
    keep = 1.0 - dropout_rate if use_dropout else 1.0
    out, lse = fp.flash_fwd_pallas(
        _pallas_shapes(q), _pallas_shapes(k), _pallas_shapes(v),
        key_mask.astype(jnp.float32), _pallas_seed(rng, use_dropout),
        num_heads=h, keep=keep, bq=fp.DEFAULT_BLOCK_Q, bkv=fp.DEFAULT_BLOCK_KV,
        mxu_bf16=fp.MXU_BF16, interpret=jax.default_backend() != "tpu",
    )
    out = out[..., :d].reshape(b, h, t, d)
    lse = lse.reshape(b, h, t)
    row_valid = jnp.broadcast_to(
        jnp.any(key_mask, axis=-1)[:, None, None], (b, h, t)
    )
    # fully-masked rows: the kernel already emits zero out / zero lse
    return out, lse, row_valid


def _flash_bwd_pallas(q, k, v, key_mask, rng, out, lse, dout, dropout_rate):
    from . import flash_pallas as fp

    b, h, t, d = q.shape
    t_kv = k.shape[2]
    use_dropout = dropout_rate > 0.0 and rng is not None
    keep = 1.0 - dropout_rate if use_dropout else 1.0
    delta = jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )
    dq, dk, dv = fp.flash_bwd_pallas(
        _pallas_shapes(q), _pallas_shapes(k), _pallas_shapes(v),
        key_mask.astype(jnp.float32), _pallas_seed(rng, use_dropout),
        lse.reshape(b * h, t), delta.reshape(b * h, t),
        _pallas_shapes(dout),
        num_heads=h, keep=keep, bq=fp.DEFAULT_BLOCK_Q, bkv=fp.DEFAULT_BLOCK_KV,
        mxu_bf16=fp.MXU_BF16, fused=fp.FUSED_BWD,
        fused_bkv=fp._FUSED_BKV_OVERRIDE,
        interpret=jax.default_backend() != "tpu",
    )
    dq = dq[..., :d].reshape(b, h, t, d).astype(q.dtype)
    dk = dk[..., :d].reshape(b, h, t_kv, d)
    dv = dv[..., :d].reshape(b, h, t_kv, d)
    return dq, dk, dv


def _kv_blocks(k, v, key_mask, block: int):
    """Pad T_kv up to a multiple of ``block`` and reshape to per-block
    leading-axis stacks for ``lax.scan``."""
    b, h, t, d = k.shape
    c = min(block, t)
    pad = (c - t % c) % c
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))
    n = k.shape[2] // c
    kb = k.reshape(b, h, n, c, d).transpose(2, 0, 1, 3, 4)
    vb = v.reshape(b, h, n, c, d).transpose(2, 0, 1, 3, 4)
    mb = key_mask.reshape(b, n, c).transpose(1, 0, 2)
    return kb, vb, mb, n, c, pad


def _block_keep_mask(rng, col0, t_kv: int, keep: float, shape):
    """Dropout keep-mask for one KV block, reproducible in the backward
    recompute without storing it.  Counter-hash (fmix32) instead of threefry
    ``bernoulli``: the masks are regenerated in BOTH passes over the full
    [T, T_kv] extent, and threefry alone measured 13.7 ms of a 40 ms attn
    train step (B=4, T=4096) — the hash form cuts that ~2/3
    (docs/PERF_NOTES.md).

    Elements are indexed by their GLOBAL position in the virtual
    ``[B, H, T, t_kv]`` attention matrix (``col0`` = the block's first kv
    column, a traced scalar), so the stream is independent of the block
    partitioning — the backward may run a different block size
    (``PVA_FLASH_BLOCK_BWD``) and still regenerate the exact sampled mask.
    Padding columns (col0+k >= t_kv) alias into neighbouring rows' indices,
    which is harmless: their probabilities are hard-zeroed by ``key_mask``
    before the mask multiplies anything.
    """
    from jax import lax

    from .hashmask import GOLDEN, fmix32, rng_seed_u32, threshold

    b, h, t, c = shape
    # same scalar key derivation as hashmask.keep_mask(offset=None)
    key = fmix32(jnp.uint32(rng_seed_u32(rng)) + jnp.uint32(GOLDEN))
    idx = (
        lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(h * t * t_kv)
        + lax.broadcasted_iota(jnp.uint32, shape, 1) * jnp.uint32(t * t_kv)
        + lax.broadcasted_iota(jnp.uint32, shape, 2) * jnp.uint32(t_kv)
        + lax.broadcasted_iota(jnp.uint32, shape, 3)
        + jnp.asarray(col0).astype(jnp.uint32)
    )
    return fmix32(idx ^ key) < jnp.uint32(threshold(keep))


def _flash_fwd_scan(q, k, v, key_mask, dropout_rate, rng, block):
    b, h, t, d = q.shape
    t_kv = k.shape[2]
    kb, vb, mb, n, c, _ = _kv_blocks(k, v, key_mask, block)
    use_dropout = dropout_rate > 0.0 and rng is not None
    keep = 1.0 - dropout_rate

    # Mixed precision: the QK/PV matmuls run in the INPUT dtype (callers pass
    # bf16 under --dtype bfloat16 / mixed-precision training), but the
    # online-softmax state — running max m, denominator l, accumulator acc —
    # and the exp/rescale chain are ALWAYS f32: the m/l carry is
    # catastrophically cancellation-sensitive in bf16 (8 mantissa bits), and
    # keeping it f32 costs only VPU work that hides behind the MXU einsums.
    def fold(carry, blk):
        m, l, acc = carry
        k_c, v_c, mask_c, step = blk
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_c,
                       preferred_element_type=jnp.float32)
        s = jnp.where(mask_c[:, None, None, :], s, NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        if use_dropout:
            p_num = p * _block_keep_mask(
                rng, step * c, t_kv, keep, p.shape) / keep
        else:
            p_num = p
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p_num.astype(v_c.dtype), v_c,
            preferred_element_type=jnp.float32)
        return (m_new, l, acc), None

    init = (
        jnp.full((b, h, t), NEG_INF, jnp.float32),
        jnp.zeros((b, h, t), jnp.float32),
        jnp.zeros((b, h, t, d), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(
        fold, init, (kb, vb, mb, jnp.arange(n, dtype=jnp.int32))
    )
    # rows with no valid key (bucket padding): zero output, benign lse
    row_valid = m > NEG_INF / 2
    l_safe = jnp.maximum(l, 1e-30)
    out = jnp.where(row_valid[..., None], acc / l_safe[..., None], 0.0)
    lse = jnp.where(row_valid, m + jnp.log(l_safe), 0.0)
    return out.astype(q.dtype), lse, row_valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 6))
def flash_self_attention(q, k, v, key_mask, dropout_rate=0.0, rng=None,
                         block=DEFAULT_BLOCK):
    """Exact attention ``dropout(softmax(q @ k^T masked)) @ v`` in
    O(T * block) memory, differentiable via the flash recompute backward.

    Args:
      q: ``[B, H, T, d]`` — **pre-scaled** by 1/sqrt(d) (caller convention,
         mirrors ``models.attention.mha_self_attention``).
      k, v: ``[B, H, T_kv, d]``.
      key_mask: ``[B, T_kv]`` bool, True = attendable.
      dropout_rate / rng: post-softmax attention-matrix dropout (train mode).
    """
    if _use_pallas():
        out, _, _ = _flash_fwd_pallas(q, k, v, key_mask, dropout_rate, rng)
    else:
        out, _, _ = _flash_fwd_scan(
            q, k, v, key_mask, dropout_rate, rng, block
        )
    return out


def _flash_vjp_fwd(q, k, v, key_mask, dropout_rate, rng, block):
    if _use_pallas():
        out, lse, row_valid = _flash_fwd_pallas(
            q, k, v, key_mask, dropout_rate, rng
        )
    else:
        out, lse, row_valid = _flash_fwd_scan(
            q, k, v, key_mask, dropout_rate, rng, block
        )
    return out, (q, k, v, key_mask, rng, out, lse, row_valid)


def _flash_vjp_bwd(dropout_rate, block, res, dout):
    q, k, v, key_mask, rng, out, lse, row_valid = res
    if _use_pallas():
        dq, dk, dv = _flash_bwd_pallas(
            q, k, v, key_mask, rng, out, lse, dout, dropout_rate
        )
        return dq, dk, dv, None, None
    b, h, t, d = q.shape
    t_kv = k.shape[2]
    # independent backward block size (working set differs: bwd holds
    # dout/delta and emits dk/dv); dropout masks are global-column keyed so
    # a different partition regenerates the identical sampled mask
    bwd_block = BWD_BLOCK or block
    kb, vb, mb, n, c, pad = _kv_blocks(k, v, key_mask, bwd_block)
    use_dropout = dropout_rate > 0.0 and rng is not None
    keep = 1.0 - dropout_rate

    # delta_i = sum_k g_ik p_ik = dout_i . out_i  — holds with dropout since
    # out = sum_k p_k m~_k v_k and g = (dout @ v^T) * m~
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)  # [B, H, T] f32
    lse_safe = jnp.where(row_valid, lse, 0.0)
    rv = row_valid[..., None]

    def fold(dq, blk):
        k_c, v_c, mask_c, step = blk
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_c,
                       preferred_element_type=jnp.float32)
        s = jnp.where(mask_c[:, None, None, :], s, NEG_INF)
        p = jnp.exp(s - lse_safe[..., None]) * rv  # normalized probs, f32
        g = jnp.einsum("bhqd,bhkd->bhqk", dout, v_c,
                       preferred_element_type=jnp.float32)
        if use_dropout:
            keep_mask = _block_keep_mask(
                rng, step * c, t_kv, keep, p.shape) / keep
            p_drop = p * keep_mask
            g = g * keep_mask
        else:
            p_drop = p
        dv_c = jnp.einsum("bhqk,bhqd->bhkd", p_drop.astype(dout.dtype), dout,
                          preferred_element_type=jnp.float32)
        ds = (p * (g - delta[..., None])).astype(q.dtype)
        dq = dq + jnp.einsum("bhqk,bhkd->bhqd", ds, k_c,
                             preferred_element_type=jnp.float32)
        dk_c = jnp.einsum("bhqk,bhqd->bhkd", ds, q,
                          preferred_element_type=jnp.float32)
        return dq, (dk_c.astype(k.dtype), dv_c.astype(v.dtype))

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dq, (dk_blocks, dv_blocks) = jax.lax.scan(
        fold, dq0, (kb, vb, mb, jnp.arange(n, dtype=jnp.int32))
    )
    dk = dk_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, n * c, d)[:, :, :t_kv]
    dv = dv_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, n * c, d)[:, :, :t_kv]
    return dq.astype(q.dtype), dk, dv, None, None


flash_self_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


# ------------------------------------------------------- head-major layout


def _bthd_fwd(q, k, v, key_mask, num_heads, dropout_rate, rng):
    from . import flash_pallas as fp

    use_dropout = dropout_rate > 0.0 and rng is not None
    keep = 1.0 - dropout_rate if use_dropout else 1.0
    out, lse = fp.flash_fwd_pallas(
        q, k, v, key_mask.astype(jnp.float32), _pallas_seed(rng, use_dropout),
        num_heads=num_heads, keep=keep, bq=fp.DEFAULT_BLOCK_Q,
        bkv=fp.DEFAULT_BLOCK_KV, mxu_bf16=fp.MXU_BF16, bthd=True,
        interpret=jax.default_backend() != "tpu",
    )
    return out, lse  # lse [BH, T] f32


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_self_attention_bthd(q, k, v, key_mask, num_heads,
                              dropout_rate=0.0, rng=None):
    """``flash_self_attention`` on the head-major FLAT ``[B, T, H*d]``
    layout — the shape that falls straight out of a packed qkv projection,
    so the caller never materializes the ``[B, H, T, d]`` transpose (or its
    inverse on the output / gradients); the kernels' block index maps carve
    each head's d-wide column slab in place.  The per-head width
    ``d = last_dim / num_heads`` must already be a 128 multiple: callers
    fold the lane pad and the 1/sqrt(head_dim) scale into the projection
    weights (zero pad lanes are exact through every matmul and receive zero
    gradients).  Pallas-only: callers route here when
    ``ops.flash._use_pallas()`` is true; the kernels, tiles, and dropout
    stream are identical to the ``[B, H, T, d]`` path (same global
    ``[B, H, T, T_kv]`` element-index hash), so the two layouts sample the
    same mask and agree to f32 tolerance.

    Reference semantics: ``/root/reference/networks.py:186-203``
    (``nn.MultiheadAttention`` over whole videos, post-softmax dropout).
    """
    out, _ = _bthd_fwd(q, k, v, key_mask, num_heads, dropout_rate, rng)
    return out


def _bthd_vjp_fwd(q, k, v, key_mask, num_heads, dropout_rate, rng):
    out, lse = _bthd_fwd(q, k, v, key_mask, num_heads, dropout_rate, rng)
    return out, (q, k, v, key_mask, rng, out, lse)


def _bthd_vjp_bwd(num_heads, dropout_rate, res, dout):
    from . import flash_pallas as fp

    q, k, v, key_mask, rng, out, lse = res
    b, t, hd_all = q.shape
    d = hd_all // num_heads
    use_dropout = dropout_rate > 0.0 and rng is not None
    keep = 1.0 - dropout_rate if use_dropout else 1.0
    # delta [B, T, H] -> [BH, T]: a tiny f32 transpose (vs the [B, T, H*d]
    # tensors the bthd layout keeps transpose-free)
    delta = jnp.sum(
        (dout.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
            b, t, num_heads, d
        ), axis=-1,
    ).transpose(0, 2, 1).reshape(b * num_heads, t)
    dq, dk, dv = fp.flash_bwd_pallas(
        q, k, v, key_mask.astype(jnp.float32), _pallas_seed(rng, use_dropout),
        lse, delta, dout,
        num_heads=num_heads, keep=keep, bq=fp.DEFAULT_BLOCK_Q,
        bkv=fp.DEFAULT_BLOCK_KV, mxu_bf16=fp.MXU_BF16, fused=fp.FUSED_BWD,
        fused_bkv=fp._FUSED_BKV_OVERRIDE, bthd=True,
        interpret=jax.default_backend() != "tpu",
    )
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


flash_self_attention_bthd.defvjp(_bthd_vjp_fwd, _bthd_vjp_bwd)
