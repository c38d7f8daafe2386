"""1-D temporal convolutions in NWC layout (TPU-native).

Weight layout ``[K, Cin, Cout]`` (``WIO``), activations ``[B, T, C]`` (``NWC``)
— the contraction K*Cin x Cout maps directly onto the MXU and XLA fuses the
surrounding element-wise ops.  Init matches ``torch.nn.Conv1d`` defaults
(Kaiming-uniform with a=sqrt(5): ``U(-1/sqrt(Cin*K), 1/sqrt(Cin*K))``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DIMNUMS = ("NWC", "WIO", "NWC")

# XLA-path dropout mask source (the Pallas kernels always use the hash
# stream in-kernel).  Flippable for A/B measurement; default set by data.
import os as _os

HASH_DROPOUT = _os.environ.get("PVA_CONV_HASH_DROPOUT", "1") == "1"

# Tap formulation: express the K=3 dilated conv as two zero-padded time
# shifts + three [B,T,C]x[C,C'] matmuls (and 1x1 convs as plain matmuls)
# instead of lax.conv_general_dilated.  Same math the SP halo path uses
# (parallel/sp.py); interleaved A/B on the B=8,T=4096 training config
# measured the conv-op step at 25.3 ms vs 12.3 ms for taps (~2x) — XLA's
# TPU convolution emitter handles the tiny-C dilated case far worse than
# straight MXU dots (docs/PERF_NOTES.md).  PVA_CONV_TAPS=0 restores convs.
CONV_TAPS = _os.environ.get("PVA_CONV_TAPS", "1") == "1"

# Packed byte masks (hashmask.keep_mask8): 4 Bernoulli samples per fmix32
# word when the keep probability is byte-exact (p=0.5 production case).
# MEASURED SLOWER and default off: the (...,C/4,4)->(...,C) byte expansion
# relayouts across the VPU's 128-lane axis and costs more than the saved
# hash ops — interleaved A/B 8.04 vs 6.40 ms/step (tools/ab_mstcn_bwd.py,
# docs/PERF_NOTES.md).  Kept as an escape hatch for hardware where lane
# shuffles are cheap.
PACKED_MASKS = _os.environ.get("PVA_PACKED_MASKS", "0") == "1"

# Packed backward for the K=3 tap conv: a custom VJP that computes all three
# tap weight grads in ONE [3C, B*T] @ [B*T, C'] MXU dot (shifted input views
# concatenated along channels) and dx in ONE [B*T, C'] @ [C', 3C] dot whose
# three channel blocks are shift-added back — instead of autodiff's six
# narrow [64, B*T]-style dots per layer (~320 per MS-TCN step).
# MEASURED SLOWER and default off: the channel concat materializes a
# [B,T,3C] array per layer whose HBM write (~12.5 MB bf16 x 80 layers)
# exceeds what the wider dot saves — the per-tap dW dots already stream
# efficiently because the contraction (B*T = 32k) is long; narrow OUTPUT
# tiles are not the bottleneck.  Interleaved A/B (tools/ab_conv_packbwd*.py,
# bf16 bench config): nopack 6.13 ms vs pack 8.12 (dw-half +1.9 ms,
# dx-half +0.23 ms).  Grad-exactness pinned across dilation classes by
# test_conv_pack_bwd_matches_autodiff; kept for hardware where concat
# writes are cheap relative to dot issue overhead.
PACK_BWD = _os.environ.get("PVA_CONV_PACK_BWD", "0") == "1"

# Frame-pair lane packing for the MS-TCN stage stack: activations run as
# [B, T/2, 2C] (two consecutive frames side by side in the lane axis) and
# every C=64 matmul becomes a 128-wide block-structured dot.  Rationale:
# XLA's TPU layout pads the minormost axis to 128 lanes, so [*, 64]
# activations waste half of every vector register and HBM tile, and a
# [*,64]@[64,64] dot runs the MXU quarter-filled.  The [B,T,C]->[B,T/2,2C]
# reshape is row-major contiguous (frame 2t then frame 2t+1), so the packed
# model is BIT-IDENTICAL to the unpacked one — including the fmix32 dropout
# stream, which hashes linear element indices (ops/hashmask.py).
# Covers the reference MS-TCN ops (networks.py:323-347) at any dilation.
PACK2 = _os.environ.get("PVA_MSTCN_PACK2", "0") == "1"


def init_conv1d(rng, in_ch: int, out_ch: int, kernel: int) -> dict:
    fan_in = in_ch * kernel
    k = 1.0 / jnp.sqrt(fan_in)
    rw, rb = jax.random.split(rng)
    return {
        "w": jax.random.uniform(rw, (kernel, in_ch, out_ch), minval=-k, maxval=k),
        "b": jax.random.uniform(rb, (out_ch,), minval=-k, maxval=k),
    }


def _shift_left(a: jax.Array, d: int) -> jax.Array:
    """``out[t] = a[t + d]`` with zero fill past the end."""
    t = a.shape[1]
    return jnp.pad(a, ((0, 0), (0, d), (0, 0)))[:, d:]


def _shift_right(a: jax.Array, d: int) -> jax.Array:
    """``out[t] = a[t - d]`` with zero fill before the start."""
    t = a.shape[1]
    return jnp.pad(a, ((0, 0), (d, 0), (0, 0)))[:, :t]


def _tap3_value(d: int, w: jax.Array, b: jax.Array, x: jax.Array) -> jax.Array:
    t = x.shape[1]
    if d >= t:
        # taps beyond the sequence are all-zero under 'same' zero padding,
        # so the layer degenerates to its center tap — and skips
        # materializing a [B, T+d, C] pad (MS-TCN dilations reach 2^19 >> T,
        # networks.py:316; value+grad equivalence for d >= T is pinned by
        # test_conv_taps_matches_conv_op[64,200])
        return x @ w[1] + b
    left = _shift_right(x, d)   # x[t - d]
    right = _shift_left(x, d)   # x[t + d]
    return left @ w[0] + x @ w[1] + right @ w[2] + b


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tap3_packed(d: int, w: jax.Array, b: jax.Array, x: jax.Array):
    return _tap3_value(d, w, b, x)


def _tap3_packed_fwd(d, w, b, x):
    return _tap3_value(d, w, b, x), (w, x)


def _tap3_packed_bwd(d, res, g):
    w, x = res
    bsz, t, c = x.shape
    cp = g.shape[-1]
    gf = g.reshape(bsz * t, cp)
    db = gf.sum(0).astype(g.dtype)
    if d >= t:
        dw1 = x.reshape(bsz * t, c).T @ gf
        zero = jnp.zeros_like(dw1)
        return jnp.stack([zero, dw1, zero]), db, g @ w[1].T
    # dW: one [3C, B*T] @ [B*T, C'] dot over the channel-concatenated
    # shifted views (each output element sums the same products as the
    # per-tap dots — packing widens only the non-contracted axis).
    xt = jnp.concatenate([_shift_right(x, d), x, _shift_left(x, d)], axis=-1)
    dw = (xt.reshape(bsz * t, 3 * c).T @ gf).reshape(3, c, cp)
    # dx: one [B*T, C'] @ [C', 3C] dot; block k holds g @ w[k]^T and is
    # shift-added at its tap offset (out[t] consumed x[t - d] via w0 and
    # x[t + d] via w2, so their cotangents travel the opposite shifts).
    dtap = (gf @ w.reshape(3 * c, cp).T).reshape(bsz, t, 3, c)
    dx = (_shift_left(dtap[:, :, 0], d) + dtap[:, :, 1]
          + _shift_right(dtap[:, :, 2], d))
    return dw, db, dx


_tap3_packed.defvjp(_tap3_packed_fwd, _tap3_packed_bwd)


# ---------------------------------------------------------------------------
# Frame-pair lane packing (PVA_MSTCN_PACK2): [B, T, C] -> [B, T/2, 2C].
# Row t' holds frames a = 2t' (lanes :C) and b = 2t'+1 (lanes C:).  All
# packed weight matrices are built per step from the [C, C'] originals —
# 128x128 of bf16/f32 per tap, negligible next to the activation streams —
# and adding the structural-zero blocks to an MXU accumulation is exact,
# so packed == unpacked bit for bit.
# ---------------------------------------------------------------------------


def pack2(x: jax.Array) -> jax.Array:
    """[B, T, C] -> [B, T/2, 2C]; row-major contiguous, T must be even."""
    b, t, c = x.shape
    return x.reshape(b, t // 2, 2 * c)


def unpack2(xp: jax.Array) -> jax.Array:
    """[B, T/2, 2C] -> [B, T, C]."""
    b, t2, c2 = xp.shape
    return xp.reshape(b, 2 * t2, c2 // 2)


def _bd2(w: jax.Array) -> jax.Array:
    """[Ci, Co] -> [2Ci, 2Co] block diagonal: both frames through ``w``."""
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [jnp.concatenate([w, z], 1), jnp.concatenate([z, w], 1)], 0)


def _b_hl2(w: jax.Array) -> jax.Array:
    """Input hi half (frame b) -> output lo half (frame a)."""
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [jnp.concatenate([z, z], 1), jnp.concatenate([w, z], 1)], 0)


def _b_lh2(w: jax.Array) -> jax.Array:
    """Input lo half (frame a) -> output hi half (frame b)."""
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [jnp.concatenate([z, w], 1), jnp.concatenate([z, z], 1)], 0)


def conv1x1_pack2(p: dict, xp: jax.Array) -> jax.Array:
    """K=1 conv on packed activations: one dense 2Ci x 2Co dot."""
    return xp @ _bd2(p["w"][0]) + jnp.concatenate([p["b"], p["b"]])


def tap3_pack2(d: int, w: jax.Array, b: jax.Array, xp: jax.Array) -> jax.Array:
    """K=3 'same' dilated conv on packed activations (``w`` [3, C, C]).

    Frame a = 2t' reads x[a-d], x[a], x[a+d]; frame b = 2t'+1 likewise.
    Even d: a row shift of d/2 keeps taps in their own lane half
    (block-diagonal weights).  Odd d: taps cross the lane boundary, so the
    left/right taps split into an off-diagonal pair at row shifts
    (d+1)/2 and (d-1)/2; for d == 1 the (d-1)/2 = 0 terms merge into one
    dense current-row matrix, keeping the dot count at three.
    """
    t = 2 * xp.shape[1]
    b2 = jnp.concatenate([b, b])
    if d >= t:
        # all shifted taps out of range under 'same' zero padding
        # (networks.py:316 reaches 2^19 >> T) — center tap only.
        return xp @ _bd2(w[1]) + b2
    if d % 2 == 0:
        s = d // 2
        return (_shift_right(xp, s) @ _bd2(w[0]) + xp @ _bd2(w[1])
                + _shift_left(xp, s) @ _bd2(w[2]) + b2)
    if d == 1:
        # row t'-1 hi -> lo (w0) | row t': bd(w1) + lo->hi (w0) + hi->lo (w2)
        # | row t'+1 lo -> hi (w2)
        m_cur = _bd2(w[1]) + _b_lh2(w[0]) + _b_hl2(w[2])
        return (_shift_right(xp, 1) @ _b_hl2(w[0]) + xp @ m_cur
                + _shift_left(xp, 1) @ _b_lh2(w[2]) + b2)
    s = (d - 1) // 2
    return (_shift_right(xp, s + 1) @ _b_hl2(w[0])
            + _shift_right(xp, s) @ _b_lh2(w[0])
            + xp @ _bd2(w[1])
            + _shift_left(xp, s) @ _b_hl2(w[2])
            + _shift_left(xp, s + 1) @ _b_lh2(w[2]) + b2)


def dilated_residual_layer_pack2(
    layer: dict,
    xp: jax.Array,
    maskp: jax.Array,
    *,
    dilation: int,
    dropout_rate: float = 0.5,
    train: bool = False,
    rng=None,
) -> jax.Array:
    """Packed ``DilatedResidualLayer`` (``networks.py:336-347``).

    Bit-identical to :func:`dilated_residual_layer` reshaped: the fmix32
    dropout stream hashes linear element indices, and pack2 preserves
    row-major element order, so ``keep_mask`` over the packed shape IS the
    unpacked mask.
    """
    out = jax.nn.relu(tap3_pack2(int(dilation), layer["conv_dilated"]["w"],
                                 layer["conv_dilated"]["b"], xp))
    out = conv1x1_pack2(layer["conv_1x1"], out)
    if train and dropout_rate > 0.0 and rng is not None:
        keep = 1.0 - dropout_rate
        if HASH_DROPOUT:
            from .hashmask import keep_mask, rng_seed_u32, threshold

            km = keep_mask(rng_seed_u32(rng), out.shape, threshold(keep))
            out = jnp.where(km, out * (1.0 / keep), jnp.zeros((), out.dtype))
        else:
            # threefry is shape-keyed, not flat-order-keyed: draw at the
            # unpacked shape so the stream matches the unpacked path.
            bsz, t2, c2 = out.shape
            km = jax.random.bernoulli(rng, keep, (bsz, 2 * t2, c2 // 2))
            out = out * pack2(km) / keep
    return (xp + out) * maskp


def conv1d(p: dict, x: jax.Array, dilation: int = 1) -> jax.Array:
    """'same'-padded dilated conv: pad = dilation*(K-1)/2 like the reference's
    ``nn.Conv1d(..., padding=dilation, dilation=dilation)`` with K=3.

    With ``CONV_TAPS`` (default), K=1/K=3 run as matmul taps over shifted
    views — ~2x faster than the conv op on this workload (see flag note);
    ``PACK_BWD`` additionally routes K=3 through the packed-backward custom
    VJP."""
    w = p["w"]
    k = w.shape[0]
    if CONV_TAPS and k == 1:
        return x @ w[0] + p["b"]
    if CONV_TAPS and k == 3:
        if PACK_BWD:
            return _tap3_packed(int(dilation), w, p["b"], x)
        return _tap3_value(int(dilation), w, p["b"], x)
    pad = dilation * (k - 1) // 2
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMNUMS,
    )
    return out + p["b"]


def _fused_bwd_enabled() -> bool:
    """Fused single-pass Pallas backward for the train-time layer
    (``conv_pallas._layer_bwd_kernel``) — MEASURED NEGATIVE on the bench
    step (12.07 vs 6.13 ms/step, tools/ab_conv_fused_bwd.py): the whole-
    [T, C] blocks fill VMEM (16.8M first cut) so nothing double-buffers
    and the per-layer kernel DMA serializes against compute, while XLA's
    autodiff already streams the saved activations at high utilization.
    Kept grad-exact behind ``PVA_CONV_FUSED_BWD=1`` (default OFF), tested
    across dilation classes in tests/test_pallas_kernels.py."""
    return _os.environ.get("PVA_CONV_FUSED_BWD") == "1"


@_partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _layer_train_fused(w_d, b_d, w_p, b_p, x, mask, seed_f32, dilation,
                       keep, interpret):
    """Train-time layer (tap forward + hash dropout) whose VJP is the
    fused Pallas backward: ONE kernel recomputes the forward in VMEM and
    emits dx plus all weight/bias grads, instead of autodiff streaming
    saved relu/1x1 activations through HBM (the 4.2 ms backward residual,
    docs/PERF_NOTES.md).  The forward here is the ordinary XLA tap path —
    values are bit-identical to the non-fused branch."""
    from jax import lax

    from .hashmask import keep_mask, threshold

    out = jax.nn.relu(_tap3_value(dilation, w_d, b_d, x))
    out = out @ w_p[0] + b_p
    if keep < 1.0:
        seed = lax.bitcast_convert_type(seed_f32, jnp.uint32)
        km = keep_mask(seed, out.shape, threshold(keep))
        out = jnp.where(km, out * (1.0 / keep), jnp.zeros((), out.dtype))
    return (x + out) * mask


def _layer_train_fused_fwd(w_d, b_d, w_p, b_p, x, mask, seed_f32, dilation,
                           keep, interpret):
    out = _layer_train_fused(w_d, b_d, w_p, b_p, x, mask, seed_f32,
                             dilation, keep, interpret)
    return out, (w_d, b_d, w_p, x, mask, seed_f32)


def _layer_train_fused_bwd(dilation, keep, interpret, res, dy):
    from .conv_pallas import _layer_bwd_call

    w_d, b_d, w_p, x, mask, seed_f32 = res
    m3 = mask if mask.ndim == 3 else mask[:, :, None]
    dw_d, db_d, dw_p, db_p, dx = _layer_bwd_call(
        w_d, b_d, w_p, x, m3, dy, seed_f32, dilation, keep,
        interpret=interpret,
    )
    # the frame mask is data (nothing differentiates w.r.t. it), but
    # custom_vjp requires a cotangent per input
    return (dw_d, db_d, dw_p, db_p, dx, jnp.zeros_like(mask),
            jnp.zeros_like(seed_f32))


_layer_train_fused.defvjp(_layer_train_fused_fwd, _layer_train_fused_bwd)


def dilated_residual_layer(
    layer: dict,
    x: jax.Array,
    mask: jax.Array,
    *,
    dilation: int,
    dropout_rate: float = 0.5,
    train: bool = False,
    rng=None,
    use_pallas: bool = False,
) -> jax.Array:
    """Reference ``DilatedResidualLayer`` (``networks.py:336-347``):
    relu(dilated conv) -> 1x1 conv -> dropout -> residual -> frame mask."""
    # the fused kernel covers eval AND train-with-dropout (in-kernel hash
    # keep-mask, seeded per video from this layer's rng); it carries a
    # custom VJP (recompute via the XLA path, same mask) so it is safe
    # under jax.grad.
    if use_pallas:
        from .conv_pallas import fused_dilated_residual

        drop = dropout_rate if (train and rng is not None) else 0.0
        seeds = (
            jax.random.bits(rng, (x.shape[0],), jnp.uint32) if drop > 0.0 else None
        )
        out = fused_dilated_residual(layer, x, mask, dilation,
                                     dropout_rate=drop, seeds=seeds)
        if out is not None:
            return out
    w_d = layer["conv_dilated"]["w"]
    w_p = layer["conv_1x1"]["w"]
    if (
        train
        and CONV_TAPS
        and HASH_DROPOUT
        and not PACKED_MASKS
        and not PACK_BWD
        and w_d.ndim == 3 and w_d.shape[0] == 3
        and w_d.shape[1] == w_d.shape[2] == w_p.shape[1] == w_p.shape[2]
        and _fused_bwd_enabled()
    ):
        from .conv_pallas import bwd_supported

        b, t, c = x.shape
        if bwd_supported(b, t, c, jnp.dtype(x.dtype).itemsize):
            from jax import lax

            from .hashmask import rng_seed_u32

            keep = (
                1.0 - dropout_rate
                if (dropout_rate > 0.0 and rng is not None) else 1.0
            )
            seed_f32 = (
                lax.bitcast_convert_type(
                    jnp.uint32(rng_seed_u32(rng)), jnp.float32)
                if keep < 1.0 else jnp.float32(0.0)
            )
            return _layer_train_fused(
                w_d, layer["conv_dilated"]["b"], w_p, layer["conv_1x1"]["b"],
                x, mask, seed_f32, dilation, keep,
                jax.default_backend() != "tpu",
            )
    out = jax.nn.relu(conv1d(layer["conv_dilated"], x, dilation))
    out = conv1d(layer["conv_1x1"], out)
    if train and dropout_rate > 0.0 and rng is not None:
        keep = 1.0 - dropout_rate
        if HASH_DROPOUT:
            # counter-hash mask stream (ops/hashmask.py): cheaper mask bits
            # than threefry; A/B-measured on the full step before defaulting
            # (docs/PERF_NOTES.md)
            from .hashmask import (
                keep_mask, keep_mask8, packed_exact, rng_seed_u32, threshold,
            )

            if PACKED_MASKS and packed_exact(keep) and out.shape[-1] % 4 == 0:
                km = keep_mask8(rng_seed_u32(rng), out.shape, keep)
            else:
                km = keep_mask(rng_seed_u32(rng), out.shape, threshold(keep))
            out = jnp.where(km, out * (1.0 / keep), jnp.zeros((), out.dtype))
        else:
            out = out * jax.random.bernoulli(rng, keep, out.shape) / keep
    return (x + out) * mask
