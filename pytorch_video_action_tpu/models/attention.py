"""Attention models: MultiHeadAttention (``attn``) and ExpWindowAttention
(``win_attn``).

References: ``networks.py:169-203`` and ``networks.py:205-240``.

The reference's ``nn.MultiheadAttention`` attends over padded frames (no
key_padding_mask) which is harmless under its exact-length batch-1 bucketing;
with bucket-rounded padding we mask padded keys so the semantics match the
reference's *effective* behavior.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.masking import length_mask, masked_mean, take_last_valid
from ..ops.rnn import gru_apply, init_rnn
from .common import dropout, init_linear, linear, log_softmax, split_rng


def init_mha(rng, embed_dim: int) -> dict:
    """torch.nn.MultiheadAttention init: xavier-uniform packed qkv projection,
    zero biases; out-proj weight keeps the Linear default init."""
    r1, r2 = jax.random.split(rng)
    bound = jnp.sqrt(6.0 / (4.0 * embed_dim))  # xavier on [3E, E]
    k = 1.0 / jnp.sqrt(embed_dim)
    return {
        "in_proj_w": jax.random.uniform(
            r1, (embed_dim, 3 * embed_dim), minval=-bound, maxval=bound
        ),
        "in_proj_b": jnp.zeros((3 * embed_dim,)),
        "out_proj_w": jax.random.uniform(
            r2, (embed_dim, embed_dim), minval=-k, maxval=k
        ),
        "out_proj_b": jnp.zeros((embed_dim,)),
    }


# above this sequence length the model switches to the blockwise
# (FlashAttention-style) kernel: O(T * BLOCK) live memory instead of the
# dense [B, H, T, T] score tensor (Breakfast videos reach 4k+ frames).
# Training included: ``ops.flash`` carries a recompute custom VJP with exact
# post-softmax attention dropout, so full videos train on one chip without
# the dense tensor (the reference trains full videos, networks.py:186-203).
BLOCKWISE_MIN_T = 1024
# KV block length for the flash scan: ops.flash.DEFAULT_BLOCK (64, tuned by
# interleaved A/B in tools/ab_flash_block.py; PVA_FLASH_BLOCK overrides with
# validation there).  Kept as a module attribute so A/B tools can monkeypatch
# the trace-time constant.
from ..ops.flash import DEFAULT_BLOCK as BLOCKWISE_BLOCK


def blockwise_self_attention(q, k, v, key_mask):
    """Online-softmax attention over KV chunks (single device; the ring
    variant in ``parallel/ring.py`` is the multi-chip analog of this loop).
    q pre-scaled ``[B, H, T, d]``; key_mask ``[B, T]`` bool.  Exact.

    Thin wrapper over ``ops.flash.flash_self_attention`` (which adds the
    flash recompute backward + train-mode dropout); note the flash kernel
    emits ZEROS for fully-masked query rows where the dense softmax emits a
    uniform average — both are padding discarded downstream."""
    from ..ops.flash import flash_self_attention

    return flash_self_attention(q, k, v, key_mask, 0.0, None, BLOCKWISE_BLOCK)


def _use_bthd() -> bool:
    """Route long sequences through the head-major flat ``[B, T, H*128]``
    flash path (``PVA_FLASH_BTHD=1``): the lane pad and 1/sqrt(head_dim)
    scale fold into the projection weights and the kernels read each head's
    column slab in place via their block index maps, so the glue carries
    ZERO transposes and ZERO activation pads.  MEASURED NEUTRAL on the
    bench config (train +0.2%, eval -0.4% — tools/ab_attn_bthd.py; XLA
    already keeps the layout copies off the critical path), so it stays
    opt-in; kept grad-exact + equivalence-tested as the escape hatch for
    shapes where the copies do bite.  Read at trace time."""
    import os

    return os.environ.get("PVA_FLASH_BTHD") == "1"


def _mha_flash_bthd(p, x, num_heads, *, key_mask, rate, rng):
    """Packed qkv projection with the per-head lane pad (head_dim -> next
    128 multiple) and the query 1/sqrt(head_dim) scale FOLDED into the
    weights: zero pad lanes are exact through every matmul (QK adds zero
    products, PV emits zero columns, the padded out-proj rows are zero) and
    receive zero gradients, so autodiff through the fold is exact.  The
    kernels read each head's 128-wide column slab of the flat
    ``[B, T, H*128]`` projection output in place — no transpose or pad ever
    touches a ``[B, T, E]``-sized tensor."""
    from ..ops.flash import flash_self_attention_bthd

    b, t, e = x.shape
    hd = e // num_heads
    dp = (128 - hd % 128) % 128
    hdp = hd + dp
    wq, wk, wv = jnp.split(p["in_proj_w"], 3, axis=1)
    bq, bk, bv = jnp.split(p["in_proj_b"], 3)
    scale = (1.0 / jnp.sqrt(hd)).astype(p["in_proj_w"].dtype)

    def fold(w, b_, s=None):
        w = w.reshape(e, num_heads, hd)
        b_ = b_.reshape(num_heads, hd)
        if s is not None:
            w, b_ = w * s, b_ * s
        if dp:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, dp)))
            b_ = jnp.pad(b_, ((0, 0), (0, dp)))
        return w.reshape(e, num_heads * hdp), b_.reshape(num_heads * hdp)

    wq_, bq_ = fold(wq, bq, scale)
    wk_, bk_ = fold(wk, bk)
    wv_, bv_ = fold(wv, bv)
    qkv = x @ jnp.concatenate([wq_, wk_, wv_], axis=1) + jnp.concatenate(
        [bq_, bk_, bv_]
    )
    q, k, v = jnp.split(qkv, 3, axis=-1)  # [B, T, H*hdp] head-major flat
    out = flash_self_attention_bthd(
        q, k, v, key_mask, num_heads, rate, rng if rate > 0.0 else None
    )  # [B, T, H*hdp]
    wo = p["out_proj_w"].reshape(num_heads, hd, e)
    if dp:
        wo = jnp.pad(wo, ((0, 0), (0, dp), (0, 0)))
    return out @ wo.reshape(num_heads * hdp, e) + p["out_proj_b"]


def mha_self_attention(
    p: dict,
    x: jax.Array,
    num_heads: int,
    *,
    key_mask: jax.Array | None = None,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng=None,
):
    """Self-attention over ``x [B, T, E]`` with optional key padding mask.
    Long sequences at eval use the blockwise form (memory O(T*BLOCK))."""
    b, t, e = x.shape
    hd = e // num_heads
    if t >= BLOCKWISE_MIN_T:
        from ..ops.flash import _use_pallas

        mask = (
            key_mask if key_mask is not None
            else jnp.ones((b, t), dtype=bool)
        )
        rate = dropout_rate if (train and rng is not None) else 0.0
        if _use_pallas() and _use_bthd():
            return _mha_flash_bthd(
                p, x, num_heads, key_mask=mask, rate=rate, rng=rng
            )
    qkv = x @ p["in_proj_w"] + p["in_proj_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z):  # [B, T, E] -> [B, H, T, hd]
        return z.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q) / jnp.sqrt(hd).astype(x.dtype), heads(k), heads(v)
    if t >= BLOCKWISE_MIN_T:
        from ..ops.flash import flash_self_attention

        out = flash_self_attention(
            q, k, v, mask, rate, rng if rate > 0.0 else None, BLOCKWISE_BLOCK
        )
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if key_mask is not None:
            scores = jnp.where(key_mask[:, None, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = dropout(rng, attn, dropout_rate, train)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, e)
    return out @ p["out_proj_w"] + p["out_proj_b"]


# ----------------------------------------------------------------- attn model


@dataclass(frozen=True)
class AttnConfig:
    input_dim: int = 400
    num_heads: int = 4
    hidden_dim: int = 256
    dropout_rate: float = 0.3
    n_class: int = 48
    mode: str = "cont"


def init_attn(rng, cfg: AttnConfig) -> dict:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "attention": init_mha(r1, cfg.input_dim),
        "rnn": init_rnn(
            r2, cfg.input_dim, cfg.hidden_dim // 2, 1, bidirectional=True, n_gates=3
        ),
        "output": init_linear(r3, cfg.hidden_dim, cfg.n_class),
    }


def apply_attn(params, cfg: AttnConfig, x, lengths, *, train=False, rng=None):
    r_attn, r_rnn = split_rng(rng, 2)
    mask = length_mask(lengths, x.shape[1])
    h = mha_self_attention(
        params["attention"], x, cfg.num_heads,
        key_mask=mask, dropout_rate=cfg.dropout_rate, train=train, rng=r_attn,
    )
    h = gru_apply(
        params["rnn"], h, lengths, cfg.hidden_dim // 2,
        bidirectional=True, dropout_rate=0.0, train=train, rng=r_rnn,
    )
    if cfg.mode == "last":
        h = take_last_valid(h, lengths)
    elif cfg.mode == "avg":
        h = masked_mean(h, mask)
    return log_softmax(linear(params["output"], jax.nn.relu(h)))


# ------------------------------------------------------------------- win_attn


@dataclass(frozen=True)
class WinAttnConfig:
    input_dim: int = 400
    num_heads: int = 4
    n_class: int = 48
    dropout_rate: float = 0.3
    window_size: int = 5
    # True (default): mask keys past `lengths` so outputs are invariant to
    # bucket rounding.  False reproduces the reference exactly (attends its
    # own zero-pad tail and batch padding, networks.py:221) for oracle
    # parity tests.
    mask_padding: bool = True


def init_win_attn(rng, cfg: WinAttnConfig) -> dict:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "attention": init_mha(r1, cfg.input_dim),
        "output": init_linear(r2, cfg.input_dim, cfg.n_class),
        # declared in the reference but unused in its forward (networks.py:215)
        "combine_output": init_linear(
            r3, cfg.n_class * (cfg.window_size + 1), cfg.n_class
        ),
    }


def apply_win_attn(params, cfg: WinAttnConfig, x, lengths, *, train=False, rng=None):
    """Strided windowed attention (reference ``networks.py:217-240``): for
    ``f in range(w, T, w)`` attend over frames ``[f-w, f+w+1)`` and write class
    scores only at row ``f - w``; all other rows stay zero before the final
    log_softmax.  Windows are gathered into one batched attention call — a
    single MXU-friendly einsum instead of the reference's per-window Python
    loop.

    DEVIATION (documented in README): keys beyond ``lengths`` are masked
    out.  The reference attends over its own batch padding
    (``networks.py:221`` operates on the padded batch), but its padding is
    at most the batch-max delta; under this framework's bucket rounding
    (``--bucket_multiple``) tail windows could straddle up to
    bucket_multiple-1 padded frames, so masking makes outputs invariant to
    the bucket size (tested in test_model_parity.py)."""
    b, t, e = x.shape
    w = cfg.window_size
    xp = jnp.pad(x, ((0, 0), (0, w), (0, 0)))
    centers = jnp.arange(w, t, w)  # static — t is a compile-time shape
    n_win = centers.shape[0]
    if n_win == 0:
        flat = jnp.zeros((b, t, cfg.n_class), x.dtype)
        return log_softmax(flat)
    # windows: [B * n_win, 2w+1, E]
    offs = jnp.arange(-w, w + 1)
    idx = centers[:, None] + offs[None, :]  # [n_win, 2w+1]
    win = xp[:, idx, :]  # [B, n_win, 2w+1, E]
    win = win.reshape(b * n_win, 2 * w + 1, e)
    if cfg.mask_padding:
        # mask keys past each sequence's true length (and the zero-pad tail)
        key_mask = (idx[None, :, :] < lengths[:, None, None]).reshape(
            b * n_win, 2 * w + 1
        )
    else:  # reference behavior: attend zero-pad + batch padding
        key_mask = None
    feat = mha_self_attention(
        params["attention"], win, cfg.num_heads, key_mask=key_mask,
        dropout_rate=cfg.dropout_rate, train=train, rng=rng,
    )
    center_feat = feat[:, w, :].reshape(b, n_win, e)
    probs = linear(params["output"], center_feat)  # [B, n_win, C]
    out = jnp.zeros((b, t, cfg.n_class), x.dtype)
    out = out.at[:, centers - w, :].set(probs)
    return log_softmax(out)
