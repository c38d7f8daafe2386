"""Pallas flash-attention kernels: query-tiled, VMEM-resident score tiles.

The XLA blockwise path (``ops/flash.py``) scans KV blocks with ALL queries
live per block: at the attn bench regime (B=4, H=4, T=4096, d=100) each
block materializes a ``[4, 4, 4096, 64]`` f32 score tensor (16.8 MB) plus
the rescaled ``[B, H, T, d]`` accumulator — per-step profiling shows the
two flash scans at 5.8 ms of the 9.3 ms train step, ~3x the bf16 FLOP
floor, all of it HBM traffic on those intermediates.  These kernels tile
BOTH axes: each grid step holds one ``[bq, bkv]`` score tile and the
``[bq, d]`` online-softmax state in VMEM, so nothing quadratic ever
touches HBM.

Semantics are EXCHANGEABLE with the XLA path (``flash.py``):

* same online-softmax fold (m/l/acc always f32, matmuls in the input
  dtype),
* same post-softmax dropout stream — the murmur3-fmix32 counter hash over
  the GLOBAL ``[B, H, T, T_kv]`` element index with the same scalar key
  derivation, so a Pallas forward pairs exactly with the XLA recompute
  backward (and vice versa) and any fwd/bwd block partition resamples the
  identical mask,
* same fully-masked-row contract (zero output, zero lse, zero grads).

Backward rebuilds ``p = exp(s - lse)`` from the saved log-sum-exp and
applies the softmax Jacobian through the ``delta = dout . out`` identity —
nothing ``[T, T]`` is ever stored.  Two forms:

* **fused single-pass** (default whenever the whole padded-T query block
  fits VMEM — the common case for this workload's small head_dim): grid
  ``(BH, n_kv)``, dq accumulates in scratch while dk/dv write per KV tile,
  so ALL THREE grads cost ONE score recompute / exp / dropout-hash per
  element.  The two-kernel split pays that recompute twice; the fused form
  measured +22% on the isolated fwd+bwd (B=4, H=4, T=4096, d=100).
* **two-kernel split** (dk/dv kernel with query-minor grid + dq kernel
  with KV-minor grid) for sequences too long to keep q/dout/dq resident.

Under ``MXU_BF16`` (the TPU default) the wrappers demote q/k/v/dout to
bf16 ONCE in HBM before the kernel — in-kernel per-step casts measured
negative (VMEM duplication + lane relayout every grid step) — while every
accumulator (m/l/acc, dq/dk/dv, softmax state) stays f32 via
``preferred_element_type``; this mirrors the bf16 demotion XLA's
propagation pass applies to the blockwise-scan path, so numerics match
the XLA path it replaces.

Reference workload: ``networks.py:169-203`` (nn.MultiheadAttention over
whole Breakfast videos, 4k+ frames).  Equivalence vs the XLA path (values
+ grads + dropout exactness) is tested in interpret mode on CPU in
``tests/test_flash_pallas.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashmask import fmix32, threshold

NEG_INF = -1e30

# Tile sizes, tuned by interleaved A/B on the isolated B=4 H=4 T=4096
# d=100 flash fwd (tools/ab_flash_micro.py --fwd_only, dropout 0.3):
# (512, 1024) -> 2.14 ms vs (512, 512) 2.41, (512, 2048) 2.08 (marginal,
# less VMEM headroom), (256, 512) 2.55, (1024, 512) and (4096, 256) lose —
# wide KV tiles amortize the per-grid-step overhead while the [bq, bkv]
# f32 score tile stays VMEM-resident.  The fused backward picks its own
# KV tile from the VMEM budget below.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_KV = 1024
# Run the in-kernel dots with bf16 OPERANDS (f32 accumulation via
# preferred_element_type) regardless of the input dtype — mirrors the bf16
# demotion XLA's propagation pass applies to the blockwise-scan path.
MXU_BF16 = True
# Single-pass fused backward (one recompute for dq+dk+dv) when the padded-T
# query block fits VMEM; the two-kernel split covers longer sequences.
FUSED_BWD = True
# The fused backward requests an EXPLICIT scoped-VMEM limit: XLA's default
# is 16M (a conservative compile-time check, not the hardware — v5e has
# 128M physical VMEM), and the bkv=256 tile's measured Mosaic stack is
# 17.54M, which the runtime JIT admitted but the chipless AOT helper (the
# driver's compile path) rejected.  40M covers bkv up to 512 at the bench
# workload (T=4096, d=128: estimate below gives 16.8M / 23.0M / 29.1M /
# 41.4M for 256/384/512/768) while leaving 88M for Mosaic's own
# double-buffering of the [bkv, d] k/v/dk/dv streams.
_FUSED_VMEM_LIMIT = 40 * 1024 * 1024
# Estimated-live-bytes ceiling for the AUTOMATIC tile choice (the estimate:
# ~3 f32 [tq,bkv] score/grad tiles + q/dout at the operand width + the f32
# dq scratch).  Sized so the pick stays comfortably under _FUSED_VMEM_LIMIT;
# PVA_FLASH_FUSED_BKV bypasses it for A/Bs.
_FUSED_VMEM_BUDGET = 30 * 1024 * 1024


def _env_fused_bkv():
    """PVA_FLASH_FUSED_BKV forces the fused-backward KV tile width,
    bypassing the automatic pick (A/B hook for tile sweeps under the
    explicit ``_FUSED_VMEM_LIMIT``).  Must be a positive multiple of 128
    (the lane tiling)."""
    import os

    v = os.environ.get("PVA_FLASH_FUSED_BKV")
    if v is None:
        return None
    n = int(v)
    if n < 128 or n % 128:
        raise ValueError(
            f"PVA_FLASH_FUSED_BKV must be a positive multiple of 128, got {v!r}"
        )
    return n


_FUSED_BKV_OVERRIDE = _env_fused_bkv()


def _fused_est(t: int, d: int, bkv: int, mxu_bf16: bool) -> int:
    """Estimated live VMEM bytes of the fused backward at KV tile ``bkv``:
    q + dout [tq, d] at the operand width, the f32 dq scratch [tq, d], and
    ~3 concurrent [tq, bkv] f32 score/grad tiles.  Calibrated vs measured
    Mosaic stack at the bench workload (estimate 16.78M -> measured 17.54M,
    ~1.05x); ``tests/test_flash_pallas.py`` pins estimate*1.3 <=
    _FUSED_VMEM_LIMIT for every shape the auto-pick admits."""
    tq8 = t + (-t) % 8
    opb = 2 if mxu_bf16 else 4
    return tq8 * ((2 * opb + 4) * d + 12 * bkv)


def _fused_pick(t: int, d: int, mxu_bf16: bool, fused_bkv=None):
    """KV tile width for the fused single-pass backward, or None when no
    candidate's estimated live set fits the auto budget (the caller then
    uses the two-kernel split).  ``fused_bkv`` (PVA_FLASH_FUSED_BKV)
    bypasses the budget — A/B hook, compile may legitimately OOM."""
    if fused_bkv:
        return fused_bkv
    for bkv in (256, 128):  # last dim must tile by 128 lanes
        if _fused_est(t, d, bkv, mxu_bf16) <= _FUSED_VMEM_BUDGET:
            return bkv
    return None


def _tile_keep_mask(seed, bh, iq, jkv, *, num_heads, t, t_kv, bq, bkv,
                    thresh):
    """[bq, bkv] bool keep-mask for the score tile whose rows start at global
    query iq*bq and columns at global kv jkv*bkv of head (bh % H) of batch
    (bh // H) — bitwise the stream of ``flash._block_keep_mask`` (element
    index in the virtual [B, H, T, T_kv] attention matrix, uint32 wrap)."""
    bh = bh.astype(jnp.uint32)
    off = (bh // jnp.uint32(num_heads)) * jnp.uint32(num_heads * t * t_kv) + (
        bh % jnp.uint32(num_heads)
    ) * jnp.uint32(t * t_kv)
    row = (
        iq.astype(jnp.uint32) * jnp.uint32(bq)
        + lax.broadcasted_iota(jnp.uint32, (bq, bkv), 0)
    ) * jnp.uint32(t_kv)
    col = jkv.astype(jnp.uint32) * jnp.uint32(bkv) + lax.broadcasted_iota(
        jnp.uint32, (bq, bkv), 1
    )
    return fmix32((off + row + col) ^ seed) < jnp.uint32(thresh)


# --------------------------------------------------------------- forward


def _fwd_kernel(seed_ref, mask_ref, q_ref, k_ref, v_ref, out_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, nkv, bq, bkv, t, t_kv, num_heads,
                keep, thresh):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                      # [bq, d]
    s = jnp.dot(q, k_ref[0].T, preferred_element_type=jnp.float32)
    s = jnp.where(mask_ref[0, 0][None, :] > 0, s, NEG_INF)  # [bq, bkv]

    m_prev = m_scr[...]               # [bq, 1] f32
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    # NOTE: a bf16 exp variant measured NEGATIVE here (+5% step time):
    # the f32<->bf16 casts relayout across vector lanes and cost more than
    # the faster transcendental saves (same failure mode as the round-3
    # packed-byte-masks result) — keep the whole VPU chain f32.
    p = jnp.exp(s - m_new)            # [bq, bkv] f32
    l_scr[...] = l_scr[...] * alpha + p.sum(axis=-1, keepdims=True)
    m_scr[...] = m_new

    if keep < 1.0:
        km = _tile_keep_mask(
            jnp.uint32(seed_ref[0]), pl.program_id(0), pl.program_id(1), j,
            num_heads=num_heads, t=t, t_kv=t_kv, bq=bq, bkv=bkv,
            thresh=thresh,
        )
        p = p * km.astype(jnp.float32) / keep

    acc_scr[...] = acc_scr[...] * alpha + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(j == nkv - 1)
    def _fin():
        m = m_scr[...]
        row_valid = m > NEG_INF / 2
        l_safe = jnp.maximum(l_scr[...], 1e-30)
        out = jnp.where(row_valid, acc_scr[...] / l_safe, 0.0)
        out_ref[0] = out.astype(out_ref.dtype)
        lse = jnp.where(row_valid, m + jnp.log(l_safe), 0.0)
        lse_ref[0, 0] = lse[:, 0]


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (mult - size % mult) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "keep", "bq", "bkv", "mxu_bf16", "bthd",
                     "interpret"),
)
def flash_fwd_pallas(q, k, v, mask_f32, seed_u32, *, num_heads, keep=1.0,
                     bq=DEFAULT_BLOCK_Q, bkv=DEFAULT_BLOCK_KV,
                     mxu_bf16=MXU_BF16, bthd=False, interpret=False):
    """Query/KV-tiled flash forward.

    q/k/v ``[BH, T, d]`` (q pre-scaled; d padded to a lane multiple by the
    caller), mask_f32 ``[B, T_kv]`` (1.0 attendable), seed_u32 ``[1]``.
    Returns ``out [BH, T, d]`` (input dtype) and ``lse [BH, T]`` f32.

    ``bthd=True`` switches the q/k/v/out layout to head-major FLAT
    ``[B, T, H*d]`` — the natural shape straight out of the packed qkv
    projection (d = per-head width, a 128 multiple).  Each head's d-wide
    column slab is carved out by the BlockSpec index maps (the last-dim
    BLOCK index is ``bh % H``), so the glue never materializes a
    ``[B, H, T, d]`` transpose; the same grid/tiles/dropout stream run
    either way and ``lse`` stays ``[BH, T]``.  (A 4D ``[B, T, H, d]`` form
    is NOT expressible: Mosaic requires the last two block dims divisible
    by (8, 128), which a singleton head block violates.)
    """
    if bthd:
        b_n, t, hd_all = q.shape
        h_n = num_heads
        d = hd_all // h_n
        if hd_all % h_n or d % 128:
            raise ValueError(
                f"bthd layout needs [B, T, H*d] with d a 128 multiple, got "
                f"{q.shape} for {h_n} heads"
            )
        bh_n = b_n * h_n
        t_kv = k.shape[1]
    else:
        bh_n, t, d = q.shape
        t_kv = k.shape[1]
    bq_ = min(bq, t)
    bkv_ = min(bkv, t_kv)
    qp = _pad_to(q, 1, bq_)
    kp = _pad_to(k, 1, bkv_)
    vp = _pad_to(v, 1, bkv_)
    mp = _pad_to(mask_f32, 1, bkv_)
    tq, tk = qp.shape[1], kp.shape[1]
    nq, nkv = tq // bq_, tk // bkv_

    if mxu_bf16:
        # one HBM-side demotion instead of a per-grid-step in-kernel cast
        # (which also duplicated the f32 tile in VMEM); accumulation stays
        # f32 via preferred_element_type, out is cast back by the caller
        qp, kp, vp = (a.astype(jnp.bfloat16) for a in (qp, kp, vp))
    kern = functools.partial(
        _fwd_kernel, nkv=nkv, bq=bq_, bkv=bkv_, t=t, t_kv=t_kv,
        num_heads=num_heads, keep=keep, thresh=threshold(keep),
    )
    if bthd:
        q_spec = pl.BlockSpec(
            (1, bq_, d), lambda bh, i, j: (bh // num_heads, i,
                                           bh % num_heads),
            memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec(
            (1, bkv_, d), lambda bh, i, j: (bh // num_heads, j,
                                            bh % num_heads),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b_n, tq, hd_all), qp.dtype)
    else:
        q_spec = pl.BlockSpec((1, bq_, d), lambda bh, i, j: (bh, i, 0),
                              memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, bkv_, d), lambda bh, i, j: (bh, j, 0),
                               memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((bh_n, tq, d), qp.dtype)
    out, lse = pl.pallas_call(
        kern,
        grid=(bh_n, nq, nkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # seed
            pl.BlockSpec((1, 1, bkv_),
                         lambda bh, i, j: (bh // num_heads, 0, j),
                         memory_space=pltpu.VMEM),                    # mask
            q_spec,                                                   # q
            kv_spec,                                                  # k
            kv_spec,                                                  # v
        ],
        out_specs=[
            q_spec,
            pl.BlockSpec((1, 1, bq_), lambda bh, i, j: (bh, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_shape,
            jax.ShapeDtypeStruct((bh_n, 1, tq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq_, 1), jnp.float32),
            pltpu.VMEM((bq_, 1), jnp.float32),
            pltpu.VMEM((bq_, d), jnp.float32),
        ],
        interpret=interpret,
    )(seed_u32, mp[:, None, :], qp, kp, vp)
    return out[:, :t].astype(q.dtype), lse[:, 0, :t]


# --------------------------------------------------------------- backward


def _dkdv_kernel(seed_ref, mask_ref, q_ref, dout_ref, lse_ref, delta_ref,
                 k_ref, v_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, nq, bq,
                 bkv, t, t_kv, num_heads, keep, thresh):
    i = pl.program_id(2)  # query-tile index (minor)

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]                      # [bq, d]
    dout = dout_ref[0]                # [bq, d]
    s = jnp.dot(q, k_ref[0].T, preferred_element_type=jnp.float32)
    s = jnp.where(mask_ref[0, 0][None, :] > 0, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0][:, None])       # [bq, bkv] f32
    g = jnp.dot(dout, v_ref[0].T, preferred_element_type=jnp.float32)

    if keep < 1.0:
        km = _tile_keep_mask(
            jnp.uint32(seed_ref[0]), pl.program_id(0), i, pl.program_id(1),
            num_heads=num_heads, t=t, t_kv=t_kv, bq=bq, bkv=bkv,
            thresh=thresh,
        ).astype(jnp.float32) / keep
        p_drop = p * km
        g = g * km
    else:
        p_drop = p

    # dv += p_drop^T @ dout ; dk += ds^T @ q  (contract the query axis)
    dv_scr[...] += lax.dot_general(
        p_drop.astype(dout.dtype), dout, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (g - delta_ref[0, 0][:, None])).astype(q.dtype)
    dk_scr[...] += lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == nq - 1)
    def _fin():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_fused_kernel(seed_ref, mask_ref, q_ref, dout_ref, lse_ref,
                      delta_ref, k_ref, v_ref, dq_ref, dk_ref, dv_ref,
                      dq_scr, *, nkv, tq, bkv, t, t_kv, num_heads, keep,
                      thresh):
    """Single-pass backward: ALL queries stay VMEM-resident (bq == padded T)
    so one sweep over KV tiles produces dq (scratch accumulate), dk and dv
    (written per tile) — ONE score recompute / exp / dropout-hash per
    element instead of the two-kernel split's two.  Feasible exactly
    because the workload is long-video attention at small d: q/dout/dq are
    [T, 128] (2 MB each at T=4096), and the [T, bkv] p/g/ds tiles bound the
    live set, so bkv (FUSED_BLOCK_KV) is the VMEM knob."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]                      # [tq, d]
    dout = dout_ref[0]                # [tq, d]
    k_c = k_ref[0]                    # [bkv, d]
    s = jnp.dot(q, k_c.T, preferred_element_type=jnp.float32)
    s = jnp.where(mask_ref[0, 0][None, :] > 0, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0][:, None])       # [tq, bkv] f32
    g = jnp.dot(dout, v_ref[0].T, preferred_element_type=jnp.float32)

    if keep < 1.0:
        # iq=0 with bq=tq: rows are already global query indices
        km = _tile_keep_mask(
            jnp.uint32(seed_ref[0]), pl.program_id(0),
            jnp.int32(0), j,
            num_heads=num_heads, t=t, t_kv=t_kv, bq=tq, bkv=bkv,
            thresh=thresh,
        ).astype(jnp.float32) / keep
        p_drop = p * km
        g = g * km
    else:
        p_drop = p

    dv_ref[0] = lax.dot_general(
        p_drop.astype(dout.dtype), dout, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    ds = (p * (g - delta_ref[0, 0][:, None])).astype(q.dtype)
    dk_ref[0] = lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)
    dq_scr[...] += jnp.dot(ds, k_c, preferred_element_type=jnp.float32)

    @pl.when(j == nkv - 1)
    def _fin():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_fused_call(q, k, v, mask_f32, seed_u32, lse, delta, dout, *,
                    num_heads, keep, bkv, mxu_bf16, interpret, bthd=False):
    orig_dtype = (q.dtype, k.dtype, v.dtype)
    """Single-pass fused backward launch: grid (BH, nkv), whole padded-T
    query block resident.  Padded query rows are neutralized by the lse
    guard (p -> exp(-BIG) == 0) exactly like the two-kernel path.
    ``bthd`` switches q/dout/k/v and dq/dk/dv to the head-major flat
    ``[B, T, H*d]`` layout via the block index maps (lse/delta stay
    ``[BH, T]``)."""
    if bthd:
        b_n, t, hd_all = q.shape
        h_n = num_heads
        d = hd_all // h_n
        bh_n = b_n * h_n
        t_kv = k.shape[1]
    else:
        bh_n, t, d = q.shape
        t_kv = k.shape[1]
    qp = _pad_to(q, 1, 8)
    dop = _pad_to(dout, 1, 8)
    lsep = _pad_to(lse, 1, 8)
    if lsep.shape[1] != t:
        pad_rows = lax.broadcasted_iota(jnp.int32, lsep.shape, 1) >= t
        lsep = jnp.where(pad_rows, -NEG_INF, lsep)
    deltap = _pad_to(delta, 1, 8)
    bkv_ = min(bkv, t_kv)
    kp = _pad_to(k, 1, bkv_)
    vp = _pad_to(v, 1, bkv_)
    mp = _pad_to(mask_f32, 1, bkv_)
    tq, tk = qp.shape[1], kp.shape[1]
    nkv = tk // bkv_
    if mxu_bf16:
        qp, dop, kp, vp = (
            a.astype(jnp.bfloat16) for a in (qp, dop, kp, vp)
        )

    kern = functools.partial(
        _bwd_fused_kernel, nkv=nkv, tq=tq, bkv=bkv_, t=t, t_kv=t_kv,
        num_heads=num_heads, keep=keep, thresh=threshold(keep),
    )
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    if bthd:
        q_spec = pl.BlockSpec(
            (1, tq, d), lambda bh, j: (bh // num_heads, 0,
                                       bh % num_heads),
            memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec(
            (1, bkv_, d), lambda bh, j: (bh // num_heads, j,
                                         bh % num_heads),
            memory_space=pltpu.VMEM)
        dq_shape = jax.ShapeDtypeStruct((b_n, tq, hd_all), jnp.float32)
        dkv_shape = jax.ShapeDtypeStruct((b_n, tk, hd_all), jnp.float32)
    else:
        q_spec = pl.BlockSpec((1, tq, d), lambda bh, j: (bh, 0, 0),
                              memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, bkv_, d), lambda bh, j: (bh, j, 0),
                               memory_space=pltpu.VMEM)
        dq_shape = jax.ShapeDtypeStruct((bh_n, tq, d), jnp.float32)
        dkv_shape = jax.ShapeDtypeStruct((bh_n, tk, d), jnp.float32)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(bh_n, nkv),
        in_specs=[
            seed_spec,
            pl.BlockSpec((1, 1, bkv_), lambda bh, j: (bh // num_heads, 0, j),
                         memory_space=pltpu.VMEM),                    # mask
            q_spec,                                                   # q
            q_spec,                                                   # dout
            pl.BlockSpec((1, 1, tq), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),                    # lse
            pl.BlockSpec((1, 1, tq), lambda bh, j: (bh, 0, 0),
                         memory_space=pltpu.VMEM),                    # delta
            kv_spec,                                                  # k
            kv_spec,                                                  # v
        ],
        out_specs=[
            q_spec,                                                   # dq
            kv_spec,                                                  # dk
            kv_spec,                                                  # dv
        ],
        out_shape=[dq_shape, dkv_shape, dkv_shape],
        scratch_shapes=[pltpu.VMEM((tq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT
        ),
        interpret=interpret,
    )(seed_u32, mp[:, None, :], qp, dop, lsep[:, None, :],
      deltap[:, None, :], kp, vp)
    return (dq[:, :t], dk[:, :t_kv].astype(orig_dtype[1]),
            dv[:, :t_kv].astype(orig_dtype[2]))


def _dq_kernel(seed_ref, mask_ref, k_ref, v_ref, q_ref, dout_ref, lse_ref,
               delta_ref, dq_ref, dq_scr, *, nkv, bq, bkv, t, t_kv,
               num_heads, keep, thresh):
    j = pl.program_id(2)  # kv-tile index (minor)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    dout = dout_ref[0]
    k_c = k_ref[0]
    s = jnp.dot(q, k_c.T, preferred_element_type=jnp.float32)
    s = jnp.where(mask_ref[0, 0][None, :] > 0, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    g = jnp.dot(dout, v_ref[0].T, preferred_element_type=jnp.float32)

    if keep < 1.0:
        km = _tile_keep_mask(
            jnp.uint32(seed_ref[0]), pl.program_id(0), pl.program_id(1), j,
            num_heads=num_heads, t=t, t_kv=t_kv, bq=bq, bkv=bkv,
            thresh=thresh,
        ).astype(jnp.float32) / keep
        g = g * km

    ds = (p * (g - delta_ref[0, 0][:, None])).astype(q.dtype)
    dq_scr[...] += jnp.dot(ds, k_c, preferred_element_type=jnp.float32)

    @pl.when(j == nkv - 1)
    def _fin():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "keep", "bq", "bkv", "mxu_bf16", "fused",
                     "fused_bkv", "bthd", "interpret"),
)
def flash_bwd_pallas(q, k, v, mask_f32, seed_u32, lse, delta, dout, *,
                     num_heads, keep=1.0, bq=DEFAULT_BLOCK_Q,
                     bkv=DEFAULT_BLOCK_KV, mxu_bf16=MXU_BF16,
                     fused=FUSED_BWD, fused_bkv=None, bthd=False,
                     interpret=False):
    """Flash recompute backward: returns (dq f32, dk, dv) for ``[BH, T, d]``
    inputs.  ``lse``/``delta`` are ``[BH, T]`` f32 (delta = sum(dout*out)).

    Prefers the single-pass fused kernel (one recompute for all three
    grads) whenever the whole padded-T query block fits VMEM; falls back
    to the two-kernel (dk/dv, dq) split for longer sequences.  ``fused_bkv``
    forces the fused kernel's KV tile width, bypassing the VMEM-budget
    heuristic.  It is a STATIC arg resolved by the caller — the glue in
    ``ops/flash.py`` passes ``_FUSED_BKV_OVERRIDE`` (the PVA_FLASH_FUSED_BKV
    env hook) explicitly; reading the global here would freeze it into the
    first trace and silently ignore later changes.

    ``bthd=True`` takes q/k/v/dout head-major flat ``[B, T, H*d]`` and
    returns dq/dk/dv in the same layout (lse/delta stay ``[BH, T]``); only
    the fused form reads it natively."""
    if bthd:
        b_n, t, hd_all = q.shape
        h_n = num_heads
        d = hd_all // h_n
        t_kv = k.shape[1]
    else:
        bh_n, t, d = q.shape
        t_kv = k.shape[1]
    if fused:
        bkv_f = _fused_pick(t, d, mxu_bf16, fused_bkv)
        if bkv_f is not None:
            return _bwd_fused_call(
                q, k, v, mask_f32, seed_u32, lse, delta, dout,
                num_heads=num_heads, keep=keep, bkv=bkv_f,
                mxu_bf16=mxu_bf16, interpret=interpret, bthd=bthd,
            )
    if bthd:
        # head-major long-T fallback: the two-kernel split only engages
        # where the fused live set no longer fits (far beyond the bench
        # regime), so it transposes to [BH, T, d] and back rather than
        # carrying a third layout through both split kernels
        def merge(a):  # [B, T, H*d] -> [BH, T, d]
            t_len = a.shape[1]
            return a.reshape(b_n, t_len, h_n, d).transpose(0, 2, 1, 3) \
                    .reshape(b_n * h_n, t_len, d)

        dq, dk, dv = flash_bwd_pallas(
            merge(q), merge(k), merge(v), mask_f32, seed_u32, lse, delta,
            merge(dout), num_heads=num_heads, keep=keep, bq=bq, bkv=bkv,
            mxu_bf16=mxu_bf16, fused=False, interpret=interpret,
        )

        def split(a, t_len):  # [BH, T, d] -> [B, T, H*d]
            return a.reshape(b_n, h_n, t_len, d).transpose(0, 2, 1, 3) \
                    .reshape(b_n, t_len, hd_all)

        return split(dq, t), split(dk, t_kv), split(dv, t_kv)
    bq_ = min(bq, t)
    bkv_ = min(bkv, t_kv)
    qp = _pad_to(q, 1, bq_)
    dop = _pad_to(dout, 1, bq_)
    # padded query rows must contribute nothing to dk/dv: their recomputed
    # p = exp(s - 0) is garbage unless their lse forces it to zero
    lsep = _pad_to(lse, 1, bq_)
    if lsep.shape[1] != t:
        pad_rows = (
            lax.broadcasted_iota(jnp.int32, lsep.shape, 1) >= t
        )
        lsep = jnp.where(pad_rows, -NEG_INF, lsep)  # exp(s - BIG) == 0
    deltap = _pad_to(delta, 1, bq_)
    kp = _pad_to(k, 1, bkv_)
    vp = _pad_to(v, 1, bkv_)
    mp = _pad_to(mask_f32, 1, bkv_)
    tq, tk = qp.shape[1], kp.shape[1]
    nq, nkv = tq // bq_, tk // bkv_

    if mxu_bf16:
        qp, dop, kp, vp = (
            a.astype(jnp.bfloat16) for a in (qp, dop, kp, vp)
        )
    common = dict(bq=bq_, bkv=bkv_, t=t, t_kv=t_kv, num_heads=num_heads,
                  keep=keep, thresh=threshold(keep))

    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_dkdv_kernel, nq=nq, **common),
        grid=(bh_n, nkv, nq),
        in_specs=[
            seed_spec,
            pl.BlockSpec((1, 1, bkv_),
                         lambda bh, j, i: (bh // num_heads, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq_, d), lambda bh, j, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq_, d), lambda bh, j, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq_), lambda bh, j, i: (bh, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq_), lambda bh, j, i: (bh, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv_, d), lambda bh, j, i: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv_, d), lambda bh, j, i: (bh, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bkv_, d), lambda bh, j, i: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv_, d), lambda bh, j, i: (bh, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh_n, tk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh_n, tk, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv_, d), jnp.float32),
            pltpu.VMEM((bkv_, d), jnp.float32),
        ],
        interpret=interpret,
    )(seed_u32, mp[:, None, :], qp, dop, lsep[:, None, :],
      deltap[:, None, :], kp, vp)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, nkv=nkv, **common),
        grid=(bh_n, nq, nkv),
        in_specs=[
            seed_spec,
            pl.BlockSpec((1, 1, bkv_),
                         lambda bh, i, j: (bh // num_heads, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv_, d), lambda bh, i, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv_, d), lambda bh, i, j: (bh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq_, d), lambda bh, i, j: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq_, d), lambda bh, i, j: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq_), lambda bh, i, j: (bh, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq_), lambda bh, i, j: (bh, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq_, d), lambda bh, i, j: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh_n, tq, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bq_, d), jnp.float32)],
        interpret=interpret,
    )(seed_u32, mp[:, None, :], kp, vp, qp, dop, lsep[:, None, :],
      deltap[:, None, :])

    return (dq[:, :t], dk[:, :t_kv].astype(k.dtype),
            dv[:, :t_kv].astype(v.dtype))
