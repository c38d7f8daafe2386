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

Verified against the dense path (values + grads) and against plain autodiff
through the same blockwise computation (dropout on) in
``tests/test_pallas_kernels.py``/``tests/test_model_parity.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30
DEFAULT_BLOCK = 512


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


def _block_keep_mask(rng, step, keep: float, shape):
    """Per-block dropout keep-mask, reproducible in the backward recompute
    without storing it.  Counter-hash (fmix32) instead of threefry
    ``bernoulli``: the masks are regenerated in BOTH passes over the full
    [T, T_kv] extent, and threefry alone measured 13.7 ms of a 40 ms attn
    train step (B=4, T=4096) — the hash form cuts that ~2/3
    (docs/PERF_NOTES.md)."""
    from .hashmask import keep_mask, rng_seed_u32, threshold

    return keep_mask(rng_seed_u32(rng), shape, threshold(keep), offset=step)


def _flash_fwd_scan(q, k, v, key_mask, dropout_rate, rng, block):
    b, h, t, d = q.shape
    kb, vb, mb, n, c, _ = _kv_blocks(k, v, key_mask, block)
    use_dropout = dropout_rate > 0.0 and rng is not None
    keep = 1.0 - dropout_rate

    def fold(carry, blk):
        m, l, acc = carry
        k_c, v_c, mask_c, step = blk
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_c)
        s = jnp.where(mask_c[:, None, None, :], s, NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        if use_dropout:
            p_num = p * _block_keep_mask(rng, step, keep, p.shape) / keep
        else:
            p_num = p
        acc = acc * alpha[..., None] + jnp.einsum("bhqk,bhkd->bhqd", p_num, v_c)
        return (m_new, l, acc), None

    init = (
        jnp.full((b, h, t), NEG_INF, q.dtype),
        jnp.zeros((b, h, t), q.dtype),
        jnp.zeros((b, h, t, d), q.dtype),
    )
    (m, l, acc), _ = jax.lax.scan(
        fold, init, (kb, vb, mb, jnp.arange(n, dtype=jnp.int32))
    )
    # rows with no valid key (bucket padding): zero output, benign lse
    row_valid = m > NEG_INF / 2
    l_safe = jnp.maximum(l, 1e-30)
    out = jnp.where(row_valid[..., None], acc / l_safe[..., None], 0.0)
    lse = jnp.where(row_valid, m + jnp.log(l_safe), 0.0)
    return out, lse, row_valid


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
    out, _, _ = _flash_fwd_scan(q, k, v, key_mask, dropout_rate, rng, block)
    return out


def _flash_vjp_fwd(q, k, v, key_mask, dropout_rate, rng, block):
    out, lse, row_valid = _flash_fwd_scan(
        q, k, v, key_mask, dropout_rate, rng, block
    )
    return out, (q, k, v, key_mask, rng, out, lse, row_valid)


def _flash_vjp_bwd(dropout_rate, block, res, dout):
    q, k, v, key_mask, rng, out, lse, row_valid = res
    b, h, t, d = q.shape
    t_kv = k.shape[2]
    kb, vb, mb, n, c, pad = _kv_blocks(k, v, key_mask, block)
    use_dropout = dropout_rate > 0.0 and rng is not None
    keep = 1.0 - dropout_rate

    # delta_i = sum_k g_ik p_ik = dout_i . out_i  — holds with dropout since
    # out = sum_k p_k m~_k v_k and g = (dout @ v^T) * m~
    delta = jnp.sum(dout * out, axis=-1)  # [B, H, T]
    lse_safe = jnp.where(row_valid, lse, 0.0)
    rv = row_valid[..., None]

    def fold(dq, blk):
        k_c, v_c, mask_c, step = blk
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_c)
        s = jnp.where(mask_c[:, None, None, :], s, NEG_INF)
        p = jnp.exp(s - lse_safe[..., None]) * rv  # normalized probs
        if use_dropout:
            keep_mask = _block_keep_mask(rng, step, keep, p.shape) / keep
            p_drop = p * keep_mask
            g = jnp.einsum("bhqd,bhkd->bhqk", dout, v_c) * keep_mask
        else:
            p_drop = p
            g = jnp.einsum("bhqd,bhkd->bhqk", dout, v_c)
        dv_c = jnp.einsum("bhqk,bhqd->bhkd", p_drop, dout)
        ds = p * (g - delta[..., None])
        dq = dq + jnp.einsum("bhqk,bhkd->bhqd", ds, k_c)
        dk_c = jnp.einsum("bhqk,bhqd->bhkd", ds, q)
        return dq, (dk_c, dv_c)

    dq0 = jnp.zeros_like(q)
    dq, (dk_blocks, dv_blocks) = jax.lax.scan(
        fold, dq0, (kb, vb, mb, jnp.arange(n, dtype=jnp.int32))
    )
    dk = dk_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, n * c, d)[:, :, :t_kv]
    dv = dv_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, n * c, d)[:, :, :t_kv]
    return dq, dk, dv, None, None


flash_self_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)
