"""Pallas fused dilated-residual kernel for MS-TCN.

Reference layer (``networks.py:336-347``): ``relu(dilated_conv3(x)) -> 1x1
conv -> dropout -> residual -> mask``.  The XLA path runs this as two
``conv_general_dilated`` calls with elementwise glue — each conv round-trips
the ``[B, T, C]`` activation through HBM.  This kernel keeps one video's
whole activation in VMEM and does the entire layer in a single pass:

* A 3-tap dilated conv is three per-frame matmuls whose outputs are
  **time-shifted** copies of each other: ``out[t] = x[t-d]@w0 + x[t]@w1 +
  x[t+d]@w2``.  Since the matmul is per-row, shift-then-matmul ==
  matmul-then-shift, so the kernel computes ``x @ wk`` on the MXU (one
  ``[T, C] x [C, C]`` matmul per tap, lane-packed) and applies the ±d row
  shift to the *result* with static slices — no halo logic, any dilation
  (MS-TCN uses d = 2^0..2^19, routinely >= T, where the tap contributes
  zeros and is skipped at trace time).
* relu, the 1x1 conv matmul, bias adds, dropout, residual add and frame
  masking all happen on the VMEM-resident block before one single write
  back to HBM.

Training dropout runs **inside the kernel**: the keep-mask is a
counter-based hash (murmur3 fmix32 over the element index, folded with a
per-(video, layer) seed derived from the JAX PRNG key on the host).  Plain
integer VPU ops — unlike ``pltpu.prng_random_bits`` the stream is bitwise
reproducible in interpret mode on CPU *and* regenerable by the XLA backward,
so the custom VJP recomputes the forward (including the identical mask)
through ``_xla_layer`` without materializing the mask in HBM.

Grid: one program per batch element (MS-TCN trains whole videos; T is the
padded bucket length).  VMEM footprint ~= (T*C) * 6 floats + 4 C*C weight
tiles — C=64, T<=8k => ~7 MB, within the ~16 MB budget; larger T falls back
to XLA (``supported`` check).

Numerics vs. the XLA path (eval + train-with-dropout) are tested in
``tests/test_pallas_kernels.py`` (interpret mode on CPU).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below ~16 MB/core


from .hashmask import threshold as _threshold  # noqa: E402  (shared stream)


def _keep_mask(seed_u32, t: int, c: int, threshold: int):
    """[t, c] bool keep-mask from a scalar uint32 seed — the shared
    murmur3-fmix32 counter hash (ops/hashmask.py): full avalanche, constant
    shifts only (Mosaic-friendly), identical bits under XLA and Pallas (used
    by both the kernel forward and the XLA recompute backward)."""
    from .hashmask import keep_mask

    return keep_mask(seed_u32, (t, c), threshold)


def _xla_layer(w_d, b_d, w_p, b_p, x, mask, seeds, dilation, keep):
    """Reference XLA implementation; with ``keep < 1`` applies the same
    hash-dropout the kernel uses (``seeds``: [B] uint32).  Serves as the
    custom-VJP recompute backward and the equivalence oracle in tests."""
    pad = dilation
    out = jax.lax.conv_general_dilated(
        x, w_d, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b_d
    out = jax.nn.relu(out)
    out = jax.lax.conv_general_dilated(
        out, w_p, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b_p
    if keep is not None and keep < 1.0:
        _, t, c = out.shape
        km = jax.vmap(lambda s: _keep_mask(s, t, c, _threshold(keep)))(seeds)
        out = jnp.where(km, out * (1.0 / keep), jnp.zeros((), out.dtype))
    return (x + out) * mask


def _kernel(x_ref, mask_ref, seed_ref, w0_ref, w1_ref, w2_ref, bd_ref,
            wp_ref, bp_ref, out_ref, *, dilation: int, keep: float):
    x = x_ref[0]          # [T, C]
    t, c = x.shape
    d = dilation
    # center tap + bias
    g = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    g += bd_ref[...]
    if d < t:
        # left tap: out[t] += x[t-d] @ w0  == shift_down(x @ w0, d)
        z0 = jnp.dot(x[: t - d], w0_ref[...], preferred_element_type=jnp.float32)
        g += jnp.pad(z0, ((d, 0), (0, 0)))
        # right tap: out[t] += x[t+d] @ w2 == shift_up(x @ w2, d)
        z2 = jnp.dot(x[d:], w2_ref[...], preferred_element_type=jnp.float32)
        g += jnp.pad(z2, ((0, d), (0, 0)))
    h = jnp.maximum(g, 0.0)
    out = jnp.dot(h, wp_ref[...], preferred_element_type=jnp.float32)
    out += bp_ref[...]
    if keep < 1.0:
        km = _keep_mask(seed_ref[pl.program_id(0)], t, c, _threshold(keep))
        out = jnp.where(km, out * (1.0 / keep), 0.0)
    out_ref[0] = ((x + out) * mask_ref[0]).astype(out_ref.dtype)


def supported(b: int, t: int, c: int, dtype_bytes: int = 4) -> bool:
    # x, g/h, out resident + shifted-tap temporaries (dtype-sized) plus the
    # uint32 hash words for the dropout mask (always 4 bytes)
    return (5 * t * c + 4 * c * c) * dtype_bytes + 4 * t * c <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("dilation", "keep", "interpret"))
def _fused_call(w_d, b_d, w_p, b_p, x, mask, seeds_f32, dilation, keep,
                interpret=False):
    b, t, c = x.shape
    w0, w1, w2 = w_d[0], w_d[1], w_d[2]
    wp = w_p[0]
    # seeds ride through the custom_vjp boundary bitcast to f32 (so their
    # cotangent is an ordinary zeros array); the kernel wants the raw bits
    seeds = lax.bitcast_convert_type(seeds_f32, jnp.uint32)
    grid = (b,)
    blk = pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mblk = pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # whole [B] seeds array in SMEM (TPU lowering rejects rank-1 blocked
    # specs that don't tile by 128); the kernel indexes it by program id
    sblk = pl.BlockSpec(memory_space=pltpu.SMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, dilation=dilation, keep=keep),
        grid=grid,
        in_specs=[blk, mblk, sblk, wspec, wspec, wspec, wspec, wspec, wspec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(x, mask, seeds, w0, w1, w2, b_d, wp, b_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused(w_d, b_d, w_p, b_p, x, mask, seeds_f32, dilation, keep, interpret):
    return _fused_call(w_d, b_d, w_p, b_p, x, mask, seeds_f32, dilation, keep,
                       interpret=interpret)


def _fused_fwd(w_d, b_d, w_p, b_p, x, mask, seeds_f32, dilation, keep,
               interpret):
    out = _fused(w_d, b_d, w_p, b_p, x, mask, seeds_f32, dilation, keep,
                 interpret)
    return out, (w_d, b_d, w_p, b_p, x, mask, seeds_f32)


def _fused_bwd(dilation, keep, interpret, res, dout):
    w_d, b_d, w_p, b_p, x, mask, seeds_f32 = res
    seeds = lax.bitcast_convert_type(seeds_f32, jnp.uint32)
    _, vjp = jax.vjp(
        lambda *a: _xla_layer(*a, seeds=seeds, dilation=dilation, keep=keep),
        w_d, b_d, w_p, b_p, x, mask,
    )
    return vjp(dout) + (jnp.zeros_like(seeds_f32),)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_dilated_residual(layer: dict, x, mask, dilation: int,
                           dropout_rate: float = 0.0, seeds=None,
                           interpret: bool | None = None):
    """Fused MS-TCN residual layer; returns None when shapes exceed the VMEM
    budget (caller falls back to the XLA path).

    ``dropout_rate > 0`` requires ``seeds`` ([B] uint32, one per video —
    derive from the layer's PRNG key on the host); the keep-mask is
    generated in-kernel and regenerated bit-identically by the XLA
    recompute backward.  ``interpret`` defaults to auto: native on TPU,
    interpreter elsewhere (same convention as ``rnn_pallas.gru_scan``)."""
    b, t, c = x.shape
    dtype_bytes = jnp.dtype(x.dtype).itemsize
    if layer["conv_dilated"]["w"].shape[0] != 3 or not supported(b, t, c, dtype_bytes):
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    keep = 1.0 - float(dropout_rate)
    if keep < 1.0:
        if seeds is None:
            raise ValueError("dropout_rate > 0 requires per-video seeds")
        seeds_f32 = lax.bitcast_convert_type(
            jnp.asarray(seeds, jnp.uint32), jnp.float32)
    else:
        seeds_f32 = jnp.zeros((b,), jnp.float32)
    # every dilation >= T yields the identical zero-tap kernel — collapse
    # them onto one compile-cache key (MS-TCN has up to 20 dilation levels,
    # most of them >= T; this avoids ~a dozen redundant Mosaic compiles)
    if dilation >= t:
        dilation = t
    if mask.ndim == 2:
        mask = mask[:, :, None]
    return _fused(
        layer["conv_dilated"]["w"], layer["conv_dilated"]["b"],
        layer["conv_1x1"]["w"], layer["conv_1x1"]["b"],
        x, jnp.asarray(mask, x.dtype), seeds_f32, dilation, keep, interpret,
    )


def hash_dropout_reference(layer: dict, x, mask, dilation: int,
                           dropout_rate: float, seeds):
    """Pure-XLA layer with the kernel's hash-dropout semantics (test oracle
    for the in-kernel mask; also the exact function the backward recomputes
    through)."""
    if mask.ndim == 2:
        mask = mask[:, :, None]
    return _xla_layer(
        layer["conv_dilated"]["w"], layer["conv_dilated"]["b"],
        layer["conv_1x1"]["w"], layer["conv_1x1"]["b"],
        x, jnp.asarray(mask, x.dtype), jnp.asarray(seeds, jnp.uint32),
        dilation, 1.0 - float(dropout_rate),
    )


# ===================================================== whole-stage fusion
#
# One pallas_call per MS-TCN *stage*: all ``num_layers`` dilated residual
# layers run on a VMEM-resident [T, C] block, so the activation crosses HBM
# once per stage instead of once per layer.  XLA's per-layer floor is the
# mandatory read+write of [B, T, C] around every conv pair (~59 us of the
# ~80 us/layer measured at B=8, T=4096 on the bench chip — HBM 271 GB/s);
# fusing the stage removes 19/20 of that traffic.
#
# MXU packing: the three taps become ONE [T, 3C] x [3C, C] dot — the
# shifted copies ``[x<<d, x, x>>d]`` are concatenated on the lane axis and
# contracted against ``w_d`` reshaped to [3C, C] (tap-major, the natural
# [3, C, C] layout flattened), tripling the contraction depth vs. three
# K=64 dots.  The 1x1 conv stays a K=C dot.
#
# Layer loop is unrolled at trace time (static dilations 2^0..2^(L-1),
# clamped at T where the taps vanish), so every shift is a static slice.


# Tap packing for the stage kernel's dilated conv, measured at B=8, T=4096
# (docs/PERF_NOTES.md): "in" = concat shifted inputs, one K=3C dot (5.42 ms
# full eval fwd); "out" = one N=3C dot, shift results (6.41 ms — the MXU
# prefers deep contraction over wide output on this part).  Default: winner.
_STAGE_PACK = _os.environ.get("PVA_STAGE_PACK", "in")


def _stage_kernel(x_ref, mask_ref, seed_ref, wcat_ref, bd_ref, wp_ref,
                  bp_ref, out_ref, *, dilations: tuple, keep: float):
    x = x_ref[0].astype(jnp.float32)      # [T, C] residual carry, f32
    m = mask_ref[0].astype(jnp.float32)
    t, c = x.shape
    thr = _threshold(keep)
    for i, d in enumerate(dilations):
        if _STAGE_PACK == "in":
            # input packing: [x<<d, x, x>>d] [T,3C] @ wcat[i] [3C,C] (K=192)
            if d < t:
                x_l = jnp.pad(x[: t - d], ((d, 0), (0, 0)))  # x[t-d] @ row t
                x_r = jnp.pad(x[d:], ((0, d), (0, 0)))       # x[t+d] @ row t
                xcat = jnp.concatenate([x_l, x, x_r], axis=1)  # [T, 3C]
                g = jnp.dot(xcat, wcat_ref[i],
                            preferred_element_type=jnp.float32)
            else:  # taps out of range: only the center row block of wcat
                g = jnp.dot(x, wcat_ref[i, c: 2 * c],
                            preferred_element_type=jnp.float32)
        else:
            # output packing: one [T,C] @ [C,3C] dot (N=192), taps shifted
            # AFTER the matmul (shift-then-matmul == matmul-then-shift since
            # the dot is per-row) — no input concat copies
            g3 = jnp.dot(x, wcat_ref[i],
                         preferred_element_type=jnp.float32)  # [T, 3C]
            g = g3[:, c: 2 * c]
            if d < t:
                g = g + jnp.pad(g3[: t - d, :c], ((d, 0), (0, 0)))
                g = g + jnp.pad(g3[d:, 2 * c:], ((0, d), (0, 0)))
        g += bd_ref[i: i + 1]
        h = jnp.maximum(g, 0.0)
        out = jnp.dot(h, wp_ref[i], preferred_element_type=jnp.float32)
        out += bp_ref[i: i + 1]
        if keep < 1.0:
            km = _keep_mask(seed_ref[pl.program_id(0), i], t, c, thr)
            out = jnp.where(km, out * (1.0 / keep), 0.0)
        x = (x + out) * m
    out_ref[0] = x.astype(out_ref.dtype)


def stage_supported(b: int, t: int, c: int, n_layers: int,
                    dtype_bytes: int = 4) -> bool:
    # live f32 set per layer iteration: x, xcat(3C), g/h, out  (~6 T*C)
    # + all layers' weights ([L,3C,C] + [L,C,C]) + in/out blocks (dtype)
    acts = 6 * t * c * 4 + 2 * t * c * dtype_bytes
    weights = n_layers * 4 * c * c * 4
    return acts + weights + 4 * t * c <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("dilations", "keep", "interpret"))
def _stage_call(wcat, bd, wp, bp, x, mask, seeds_f32, dilations, keep,
                interpret=False):
    b, t, c = x.shape
    seeds = lax.bitcast_convert_type(seeds_f32, jnp.uint32)
    blk = pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mblk = pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec(memory_space=pltpu.SMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stage_kernel, dilations=dilations, keep=keep),
        grid=(b,),
        in_specs=[blk, mblk, sblk, wspec, wspec, wspec, wspec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(x, mask, seeds, wcat, bd, wp, bp)


def _stage_xla(wcat, bd, wp, bp, x, mask, seeds, dilations, keep):
    """The per-layer XLA chain with identical (hash-dropout) semantics —
    custom-VJP recompute backward and test oracle for the stage kernel."""
    c = x.shape[-1]
    for i, d in enumerate(dilations):
        if _STAGE_PACK == "in":
            w_d = wcat[i].reshape(3, c, c)
        else:  # [C, 3C] tap-minor -> [3, C, C]
            w_d = wcat[i].reshape(c, 3, c).transpose(1, 0, 2)
        x = _xla_layer(
            w_d, bd[i], wp[i][None], bp[i], x, mask,
            None if seeds is None else seeds[:, i], d, keep,
        )
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _stage(wcat, bd, wp, bp, x, mask, seeds_f32, dilations, keep, interpret):
    return _stage_call(wcat, bd, wp, bp, x, mask, seeds_f32, dilations, keep,
                       interpret=interpret)


def _stage_fwd(wcat, bd, wp, bp, x, mask, seeds_f32, dilations, keep,
               interpret):
    out = _stage(wcat, bd, wp, bp, x, mask, seeds_f32, dilations, keep,
                 interpret)
    return out, (wcat, bd, wp, bp, x, mask, seeds_f32)


def _stage_bwd(dilations, keep, interpret, res, dout):
    wcat, bd, wp, bp, x, mask, seeds_f32 = res
    seeds = lax.bitcast_convert_type(seeds_f32, jnp.uint32)
    _, vjp = jax.vjp(
        lambda *a: _stage_xla(*a, seeds=seeds, dilations=dilations, keep=keep),
        wcat, bd, wp, bp, x, mask,
    )
    return vjp(dout) + (jnp.zeros_like(seeds_f32),)


_stage.defvjp(_stage_fwd, _stage_bwd)


def fused_stage(layers: list, x, mask, dropout_rate: float = 0.0,
                seeds=None, interpret: bool | None = None):
    """All of one MS-TCN stage's dilated residual layers in one kernel.

    ``layers``: the stage's layer param list (dilation of layer i = 2**i,
    ``networks.py:312-347``); returns None when unsupported (caller falls
    back to the per-layer path).  ``seeds``: [B, L] uint32 when
    ``dropout_rate > 0``.  Differentiable (custom VJP recomputes through
    the XLA layer chain with the identical hash masks) — but the recompute
    re-runs a full stage forward, so the TRAIN path prefers per-layer
    kernels; this is the eval/inference fast path.
    """
    b, t, c = x.shape
    n = len(layers)
    if any(l["conv_dilated"]["w"].shape[0] != 3 for l in layers):
        return None
    if not stage_supported(b, t, c, n, jnp.dtype(x.dtype).itemsize):
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    keep = 1.0 - float(dropout_rate)
    if keep < 1.0:
        if seeds is None:
            raise ValueError("dropout_rate > 0 requires per-(video,layer) seeds")
        seeds_f32 = lax.bitcast_convert_type(
            jnp.asarray(seeds, jnp.uint32), jnp.float32)
    else:
        seeds_f32 = jnp.zeros((b, n), jnp.float32)
    dilations = tuple(min(2 ** i, t) for i in range(n))
    if mask.ndim == 2:
        mask = mask[:, :, None]
    if _STAGE_PACK == "in":
        wcat = jnp.stack(
            [l["conv_dilated"]["w"].reshape(3 * c, c) for l in layers])
    else:
        wcat = jnp.stack(
            [l["conv_dilated"]["w"].transpose(1, 0, 2).reshape(c, 3 * c)
             for l in layers])
    bd = jnp.stack([l["conv_dilated"]["b"] for l in layers])
    wp = jnp.stack([l["conv_1x1"]["w"][0] for l in layers])
    bp = jnp.stack([l["conv_1x1"]["b"] for l in layers])
    return _stage(wcat, bd, wp, bp, x, jnp.asarray(mask, x.dtype), seeds_f32,
                  dilations, keep, interpret)


# ------------------------------------------------- fused layer BACKWARD

# The MS-TCN train step's backward residual (4.2 ms vs a ~1.4 ms FLOP
# floor, docs/PERF_NOTES.md) is saved-intermediate HBM traffic: autodiff
# stores relu/1x1 activations per layer and streams them back.  This
# kernel recomputes the layer forward from its input x IN VMEM and emits
# every gradient in one pass — dx plus per-video partial weight/bias grads
# (summed by the glue; [B, C, C] partials are ~0.1 MB).  The dropout
# keep-mask is regenerated from the SAME [B, T, C] linear-index hash
# stream the XLA train path samples (ops/hashmask.keep_mask), so the VJP
# is exact for the sampled mask.  Reference op: networks.py:336-347.


def _layer_bwd_kernel(seed_ref, x_ref, dym_ref, w0_ref, w1_ref,
                      w2_ref, bd_ref, wp_ref, dx_ref, dw0_ref, dw1_ref,
                      dw2_ref, dbd_ref, dwp_ref, dbp_ref, *, dilation: int,
                      keep: float, thresh: int, t: int, c: int):
    """VMEM discipline: C=64 arrays are lane-padded to 128, so every f32
    [T, C] live value costs 2 MB at T=4096 — elementwise chains stay in
    the INPUT dtype (bf16 on the bench path) and f32 appears only as
    matmul accumulation (preferred_element_type) and the short-lived
    g/dh tensors the relu mask and bias sums need."""
    from jax import lax as _lax

    b = pl.program_id(0)
    x = x_ref[0]            # [T, C] input dtype
    # dy_m = dy * frame_mask, pre-multiplied by the glue: a [T, 1] mask
    # tile lane-pads to a full 2 MB f32 tile in VMEM, which alone OOM'd
    # the 16M budget at the bench shape
    dy_m = dym_ref[0]       # [T, C]
    d = dilation

    # recompute the pre-relu activation exactly like the forward tap path
    g = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    g += bd_ref[...]
    if d < t:
        z0 = jnp.dot(x[: t - d], w0_ref[...],
                     preferred_element_type=jnp.float32)
        g += jnp.pad(z0, ((d, 0), (0, 0)))
        z2 = jnp.dot(x[d:], w2_ref[...], preferred_element_type=jnp.float32)
        g += jnp.pad(z2, ((0, d), (0, 0)))
    hc = jnp.maximum(g, 0.0).astype(x.dtype)          # [T, C]

    if keep < 1.0:
        # the XLA path samples ONE [B, T, C] row-major mask; this video's
        # slice starts at linear index b*T*C
        from .hashmask import GOLDEN, fmix32

        key = fmix32(jnp.uint32(seed_ref[0]) + jnp.uint32(GOLDEN))
        idx = (
            b.astype(jnp.uint32) * jnp.uint32(t * c)
            + _lax.broadcasted_iota(jnp.uint32, (t, c), 0) * jnp.uint32(c)
            + _lax.broadcasted_iota(jnp.uint32, (t, c), 1)
        )
        km = fmix32(idx ^ key) < jnp.uint32(thresh)
        dout2 = jnp.where(km, dy_m * dy_m.dtype.type(1.0 / keep),
                          dy_m.dtype.type(0.0))
    else:
        dout2 = dy_m

    # 1x1 conv backward (out2 = relu(g) @ wp + bp)
    dwp_ref[0] = _lax.dot_general(
        hc, dout2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dwp_ref.dtype)
    dbp_ref[0, 0] = dout2.astype(jnp.float32).sum(axis=0)
    dh = jnp.dot(dout2, wp_ref[...].T, preferred_element_type=jnp.float32)
    dg = jnp.where(g > 0, dh, 0.0)                    # relu', f32 transient
    dbd_ref[0, 0] = dg.sum(axis=0)
    dgc = dg.astype(x.dtype)

    dw1_ref[0] = _lax.dot_general(
        x, dgc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw1_ref.dtype)
    dx = jnp.dot(dgc, w1_ref[...].T, preferred_element_type=jnp.float32)
    dx += dy_m.astype(jnp.float32)
    if d < t:
        # g[t] consumed x[t-d] via w0 and x[t+d] via w2
        dw0_ref[0] = _lax.dot_general(
            x[: t - d], dgc[d:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dw0_ref.dtype)
        dw2_ref[0] = _lax.dot_general(
            x[d:], dgc[: t - d], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dw2_ref.dtype)
        z0b = jnp.dot(dgc[d:], w0_ref[...].T,
                      preferred_element_type=jnp.float32)
        dx += jnp.pad(z0b, ((0, d), (0, 0)))          # rows [0, t-d)
        z2b = jnp.dot(dgc[: t - d], w2_ref[...].T,
                      preferred_element_type=jnp.float32)
        dx += jnp.pad(z2b, ((d, 0), (0, 0)))          # rows [d, t)
    else:
        dw0_ref[0] = jnp.zeros_like(dw0_ref[0])
        dw2_ref[0] = jnp.zeros_like(dw2_ref[0])
    dx_ref[0] = dx.astype(dx_ref.dtype)


def bwd_supported(b: int, t: int, c: int, dtype_bytes: int = 4) -> bool:
    # lane padding makes every [T, C<=128] tile cost T*128 lanes; live set
    # ~5 f32 tensors (g, dh/dg, dx, tap pads, hash words) + ~5 input-dtype
    # tensors (x, dy, dy_m/dout2, hc, dgc)
    cp = max(c, 128)
    # threshold calibrated on-chip: the bf16 bench shape (T=4096 -> 15.7M
    # estimate) compiles; the f32 one (21M) exceeds the 16M VMEM and falls
    # back to autodiff
    return (5 * t * cp * 4 + 5 * t * cp * dtype_bytes) <= 16 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("dilation", "keep", "interpret"))
def _layer_bwd_call(w_d, b_d, w_p, x, mask, dy, seed_f32, dilation, keep,
                    interpret=False):
    b, t, c = x.shape
    w0, w1, w2 = w_d[0], w_d[1], w_d[2]
    wp = w_p[0]
    seed = lax.bitcast_convert_type(seed_f32, jnp.uint32).reshape(1)
    dy_m = (dy * jnp.asarray(mask, dy.dtype)).astype(x.dtype)
    blk = pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec(memory_space=pltpu.SMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    wgrad = pl.BlockSpec((1, c, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bgrad = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    f32 = jnp.float32
    dx, dw0, dw1, dw2, dbd, dwp, dbp = pl.pallas_call(
        functools.partial(
            _layer_bwd_kernel, dilation=min(dilation, t), keep=keep,
            thresh=_threshold(keep), t=t, c=c,
        ),
        grid=(b,),
        in_specs=[sblk, blk, blk, wspec, wspec, wspec, wspec, wspec],
        out_specs=[blk, wgrad, wgrad, wgrad, bgrad, wgrad, bgrad],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, c), x.dtype),
            jax.ShapeDtypeStruct((b, c, c), f32),
            jax.ShapeDtypeStruct((b, c, c), f32),
            jax.ShapeDtypeStruct((b, c, c), f32),
            jax.ShapeDtypeStruct((b, 1, c), f32),
            jax.ShapeDtypeStruct((b, c, c), f32),
            jax.ShapeDtypeStruct((b, 1, c), f32),
        ],
        interpret=interpret,
    )(seed, x, dy_m, w0, w1, w2, b_d, wp)
    # per-video partials -> parameter grads (dtypes follow the params)
    dw_d = jnp.stack([dw0.sum(0), dw1.sum(0), dw2.sum(0)]).astype(w_d.dtype)
    db_d = dbd.sum(axis=(0, 1)).astype(b_d.dtype)
    dw_p = dwp.sum(0)[None].astype(w_p.dtype)
    db_p = dbp.sum(axis=(0, 1)).astype(b_d.dtype)
    return dw_d, db_d, dw_p, db_p, dx
