"""Ring + Ulysses sequence-parallel attention for the ``attn`` model.

The reference's ``MultiHeadAttention`` model (``networks.py:169-203``) runs
full O(T^2) self-attention over the whole video on one device.  Breakfast
videos reach thousands of frames, so on TPU we shard the **time axis** over
the ``seq`` mesh axis and keep the quadratic score matrix blockwise
(SURVEY.md §2.6 stretch components):

* **Ring attention** (`ring_attention`): each device owns a query block
  ``[B, H, T_loc, d]`` and streams every K/V block past it around the ICI
  ring with ``lax.ppermute``, folding each block into a numerically-stable
  streaming softmax (running max / denominator / numerator — the online
  softmax of FlashAttention).  Peak memory per device drops from O(T^2) to
  O(T_loc * T_loc) per ring step, and the K/V transfer overlaps with the
  score matmul of the previous block.

* **Ulysses attention** (`ulysses_attention`): ``lax.all_to_all`` converts
  time-sharding into head-sharding, runs *exact* full-sequence attention on
  each device's head group, and converts back.  Two all-to-alls instead of
  (n-1) ppermutes; preferable when heads % devices == 0 and T fits.

Both are exact (not approximations) and are verified against the dense
``mha_self_attention`` on a virtual 8-device CPU mesh in
``tests/test_parallel.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    axis_name: str = "seq",
    dropout_rate: float = 0.0,
    rng=None,
) -> jax.Array:
    """Blockwise-exact self-attention inside ``shard_map``.

    Args (all local blocks, time axis sharded over ``axis_name``):
      q, k, v:   ``[B, H, T_loc, d]`` (q pre-scaled by 1/sqrt(d))
      key_mask:  ``[B, T_loc]`` bool — True for valid (attendable) keys.
    ``dropout_rate``/``rng`` enable attention-matrix dropout with the dense
    path's post-softmax semantics: the dropout mask multiplies the NUMERATOR
    accumulator only (the softmax denominator is unaffected by dropout), so
    the result equals ``dropout(softmax(s)) @ v`` exactly — per-block masks
    are decorrelated by (ring step, device index).
    Returns the attention output block ``[B, H, T_loc, d]``.
    """
    n = lax.axis_size(axis_name)
    b, h, t_loc, d = q.shape
    if key_mask is None:
        key_mask = jnp.ones((b, t_loc), dtype=bool)
    perm = _ring_perm(n)
    use_dropout = dropout_rate > 0.0 and rng is not None
    if use_dropout:
        from ..ops.hashmask import rng_seed_u32

        # one threefry fold on a scalar (cheap) decorrelates devices; the
        # per-block masks then come from the hash stream
        seed = rng_seed_u32(jax.random.fold_in(rng, lax.axis_index(axis_name)))

    def fold(carry, kv_mask, step):
        m, l, acc = carry
        k_blk, v_blk, mask_blk = kv_mask
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_blk)
        s = jnp.where(mask_blk[:, None, None, :], s, NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1))
        # rescale previous accumulator to the new max
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        if use_dropout:
            # counter-hash mask stream (ops/hashmask.py): threefry measured
            # 13.7 ms/step on the single-chip flash path at this extent —
            # same regenerated-per-block structure here (docs/PERF_NOTES.md)
            from ..ops.hashmask import keep_mask, threshold

            keep = 1.0 - dropout_rate
            mask = keep_mask(seed, p.shape, threshold(keep), offset=step)
            p_num = p * mask / keep
        else:
            p_num = p
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p_num, v_blk
        )
        return (m_new, l, acc)

    def body(state, step):
        carry, k_cur, v_cur, mask_cur = state
        carry = fold(carry, (k_cur, v_cur, mask_cur), step)
        # rotate K/V/mask to the next device; the last rotation is dead code
        # the compiler drops (scan over static length = unrolled ring steps,
        # and reverse-mode AD works, unlike fori_loop)
        k_cur = lax.ppermute(k_cur, axis_name, perm)
        v_cur = lax.ppermute(v_cur, axis_name, perm)
        mask_cur = lax.ppermute(mask_cur, axis_name, perm)
        return (carry, k_cur, v_cur, mask_cur), None

    init = jax.tree.map(
        lambda z: lax.pcast(z, tuple(jax.typeof(q).vma), to="varying"),
        (
            jnp.full((b, h, t_loc), NEG_INF, q.dtype),
            jnp.zeros((b, h, t_loc), q.dtype),
            jnp.zeros((b, h, t_loc, d), q.dtype),
        ),
    )
    ((m, l, acc), _, _, _), _ = lax.scan(
        body, (init, k, v, key_mask), jnp.arange(n)
    )
    # fully-masked query rows (padding): every score is NEG_INF (finite), so
    # m stays NEG_INF, p = exp(0) = 1 per key and l = T — the row comes out
    # as a uniform average of v, exactly the dense path's all-masked softmax;
    # it is discarded downstream.  The 1e-30 guard only covers genuine
    # zero-length edge cases (t_loc == 0 blocks).
    return acc / jnp.maximum(l[..., None], 1e-30)


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    axis_name: str = "seq",
    dropout_rate: float = 0.0,
    rng=None,
) -> jax.Array:
    """Exact attention via head<->time all_to_all (DeepSpeed-Ulysses layout).

    Local blocks ``[B, H, T_loc, d]`` with H divisible by the axis size.
    After the first all_to_all each device holds ``[B, H/n, T, d]`` — full
    sequence, a slice of heads — so plain dense attention is exact; the
    second all_to_all restores time-sharding.

    ``dropout_rate``/``rng``: train-mode post-softmax attention-matrix
    dropout with exactly the dense path's semantics — each device holds its
    FULL [B, H/n, T, T] probability matrix, so the dense dropout applies
    directly; ``fold_in(axis_index)`` decorrelates masks across head groups.
    """
    n = lax.axis_size(axis_name)
    b, h_all, t_loc, d = q.shape
    assert h_all % n == 0, f"heads {h_all} not divisible by seq axis {n}"

    def to_heads(z):  # [B, H, T_loc, d] -> [B, H/n, T, d]
        return lax.all_to_all(z, axis_name, split_axis=1, concat_axis=2, tiled=True)

    def to_time(z):  # [B, H/n, T, d] -> [B, H, T_loc, d]
        return lax.all_to_all(z, axis_name, split_axis=2, concat_axis=1, tiled=True)

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
    if key_mask is not None:
        full_mask = lax.all_gather(key_mask, axis_name, axis=1, tiled=True)  # [B, T]
        s = jnp.where(full_mask[:, None, None, :], s, NEG_INF)
    attn = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0 and rng is not None:
        from ..ops.hashmask import keep_mask, rng_seed_u32, threshold

        keep = 1.0 - dropout_rate
        seed = rng_seed_u32(jax.random.fold_in(rng, lax.axis_index(axis_name)))
        attn = attn * keep_mask(seed, attn.shape, threshold(keep)) / keep
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    return to_time(out)


def _qkv_blocks(p: dict, x_loc: jax.Array, num_heads: int):
    """Local in-projection: ``[B, T_loc, E]`` -> q,k,v ``[B, H, T_loc, hd]``
    with q pre-scaled (mirrors ``models.attention.mha_self_attention``)."""
    b, t_loc, e = x_loc.shape
    hd = e // num_heads
    qkv = x_loc @ p["in_proj_w"] + p["in_proj_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z):
        return z.reshape(b, t_loc, num_heads, hd).transpose(0, 2, 1, 3)

    return heads(q) / jnp.sqrt(hd).astype(x_loc.dtype), heads(k), heads(v)


def sp_mha_self_attention(
    p: dict,
    x_loc: jax.Array,
    num_heads: int,
    key_mask_loc: jax.Array,
    *,
    axis_name: str = "seq",
    impl: str = "ring",
    dropout_rate: float = 0.0,
    rng=None,
) -> jax.Array:
    """Sequence-parallel equivalent of ``mha_self_attention`` on a local
    time block; returns the attended block ``[B, T_loc, E]``.  Both
    implementations support train-mode attention-matrix dropout with dense
    post-softmax semantics."""
    b, t_loc, e = x_loc.shape
    q, k, v = _qkv_blocks(p, x_loc, num_heads)
    if impl == "ring":
        out = ring_attention(q, k, v, key_mask_loc, axis_name=axis_name,
                             dropout_rate=dropout_rate, rng=rng)
    else:
        out = ulysses_attention(q, k, v, key_mask_loc, axis_name=axis_name,
                                dropout_rate=dropout_rate, rng=rng)
    out = out.transpose(0, 2, 1, 3).reshape(b, t_loc, e)
    return out @ p["out_proj_w"] + p["out_proj_b"]


def attn_forward_sp(
    params,
    cfg,
    x: jax.Array,
    lengths: jax.Array,
    mesh: Mesh,
    *,
    impl: str = "ring",
    train: bool = False,
    rng=None,
) -> jax.Array:
    """Sequence-parallel forward of the ``attn`` model: ring (or Ulysses)
    attention over time shards, then the 1-layer BiGRU on the gathered
    attended features.  Train mode applies ring attention-matrix dropout
    with the dense path's post-softmax semantics.

    The attention is the O(T^2) memory/FLOP hog and stays fully blockwise;
    the BiGRU is O(T) and inherently sequential, so its input is
    ``all_gather``ed (same [B_loc, T, E] footprint the single-device model
    materializes anyway).  Matches ``models.attention.apply_attn`` exactly
    (tested on the virtual mesh).
    """
    from ..ops.masking import length_mask, masked_mean, take_last_valid
    from ..ops.rnn import gru_apply
    from ..models.common import linear, log_softmax

    t = x.shape[1]
    drop = cfg.dropout_rate if (train and rng is not None) else 0.0

    def local_fn(params, x_loc, lengths):
        t_loc = x_loc.shape[1]
        offset = lax.axis_index("seq") * t_loc
        t_idx = offset + jnp.arange(t_loc, dtype=jnp.int32)
        mask_loc = t_idx[None, :] < lengths[:, None]  # [B_loc, T_loc]
        # decorrelate dropout across the DATA axis too (ring_attention folds
        # in the seq index itself; without this, samples on different data
        # shards would share masks, unlike the dense path)
        rng_loc = (
            jax.random.fold_in(rng, lax.axis_index("data"))
            if drop > 0.0 else rng
        )
        h_loc = sp_mha_self_attention(
            params["attention"], x_loc, cfg.num_heads, mask_loc,
            impl=impl, dropout_rate=drop, rng=rng_loc,
        )
        # gather time axis for the (cheap, sequential) recurrent tail
        h = lax.all_gather(h_loc, "seq", axis=1, tiled=True)  # [B_loc, T, E]
        h = gru_apply(
            params["rnn"], h, lengths, cfg.hidden_dim // 2,
            bidirectional=True, dropout_rate=0.0, train=False,
        )
        if cfg.mode == "last":
            h = take_last_valid(h, lengths)
        elif cfg.mode == "avg":
            h = masked_mean(h, length_mask(lengths, t))
        return log_softmax(linear(params["output"], jax.nn.relu(h)))

    out_spec = P("data", None, None) if cfg.mode == "cont" else P("data", None)
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P("data", "seq", None), P("data")),
        out_specs=out_spec,
        check_vma=False,  # GRU tail is replicated over 'seq' by construction
    )(params, x, lengths)
