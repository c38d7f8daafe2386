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
* relu, the 1x1 conv matmul, bias adds, residual add and frame masking all
  happen on the VMEM-resident block before one single write back to HBM.

Grid: one program per batch element (MS-TCN trains whole videos; T is the
padded bucket length).  VMEM footprint ~= (T*C) * 3 floats + 4 C*C weight
tiles — C=64, T<=8k => ~6 MB, within the ~16 MB budget; larger T falls back
to XLA (``supported`` check).

Training: ``fused_dilated_residual`` is wrapped in ``jax.custom_vjp`` —
forward runs this kernel, backward recomputes through the XLA reference
implementation's VJP (the layer is cheap to recompute and the backward then
fuses under XLA as before).  Numerics vs. the XLA path are tested in
``tests/test_pallas_kernels.py`` (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below ~16 MB/core


def _xla_layer(w_d, b_d, w_p, b_p, x, mask, dilation):
    """Reference XLA implementation (no dropout: kernel path is used with
    dropout folded outside or in eval)."""
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
    return (x + out) * mask


def _kernel(x_ref, mask_ref, w0_ref, w1_ref, w2_ref, bd_ref, wp_ref, bp_ref,
            out_ref, *, dilation: int):
    x = x_ref[0]          # [T, C]
    t = x.shape[0]
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
    out_ref[0] = (x + out) * mask_ref[0]


def supported(b: int, t: int, c: int, dtype_bytes: int = 4) -> bool:
    # x, g/h, out resident + shifted tap temporaries
    return (5 * t * c + 4 * c * c) * dtype_bytes <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("dilation", "interpret"))
def _fused_call(w_d, b_d, w_p, b_p, x, mask, dilation, interpret=False):
    b, t, c = x.shape
    w0, w1, w2 = w_d[0], w_d[1], w_d[2]
    wp = w_p[0]
    grid = (b,)
    blk = pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mblk = pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, dilation=dilation),
        grid=grid,
        in_specs=[blk, mblk, wspec, wspec, wspec, wspec, wspec, wspec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(x, mask, w0, w1, w2, b_d, wp, b_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(w_d, b_d, w_p, b_p, x, mask, dilation, interpret):
    return _fused_call(w_d, b_d, w_p, b_p, x, mask, dilation,
                       interpret=interpret)


def _fused_fwd(w_d, b_d, w_p, b_p, x, mask, dilation, interpret):
    out = _fused(w_d, b_d, w_p, b_p, x, mask, dilation, interpret)
    return out, (w_d, b_d, w_p, b_p, x, mask)


def _fused_bwd(dilation, interpret, res, dout):
    w_d, b_d, w_p, b_p, x, mask = res
    _, vjp = jax.vjp(
        lambda *a: _xla_layer(*a, dilation=dilation),
        w_d, b_d, w_p, b_p, x, mask,
    )
    return vjp(dout)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_dilated_residual(layer: dict, x, mask, dilation: int,
                           interpret: bool | None = None):
    """Fused MS-TCN residual layer; returns None when shapes exceed the VMEM
    budget (caller falls back to the XLA path).  ``interpret`` defaults to
    auto: native on TPU, interpreter elsewhere (same convention as
    ``rnn_pallas.gru_scan``)."""
    b, t, c = x.shape
    if layer["conv_dilated"]["w"].shape[0] != 3 or not supported(b, t, c):
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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
        x, jnp.asarray(mask, x.dtype), dilation, interpret,
    )
