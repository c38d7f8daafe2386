"""Fused bidirectional GRU LAYER kernel: projection + both directions + the
time reversal, in ONE pallas call per direction-pair (plus one for the VJP).

Why (round-4 profile of the bigru train step, docs/PERF_NOTES.md): the Pallas
scans were only ~3.3 ms of the 26.9 ms step — the rest was XLA glue, led by
``masked_reverse``'s ``take_along_axis`` gathers (~9.5 ms: reversing the
backward direction's input and un-reversing its output, forward and VJP) and
the input-projection/interleave traffic around each layer.  This kernel
eliminates all of it with TPU-native machinery instead of data movement:

* **Reversal via block index maps.**  The kernel takes the SAME ``x`` array
  twice — once with forward block maps, once with reversed maps
  (``i -> n-1-i``) — and consumes the reversed view flipped in-block, so the
  backward chain sees frames in reverse time order without any gather, copy,
  or flip materializing in HBM.  The backward direction's output is written
  through a reversed-map output ref (flipped in-block), so it leaves the
  kernel ALREADY in original time order.
* **Carry freeze instead of masked reversal.**  A globally flipped stream
  turns suffix padding into PREFIX padding for the backward chain, which
  would corrupt its carry before any valid frame.  The kernel freezes the
  backward-chain carry on padded steps (``s < T - len``), which reproduces
  ``masked_reverse`` semantics exactly on valid frames (the forward chain
  needs no freeze: prefix-form validity).
* **In-kernel projection.**  Input gates are computed per chunk on the MXU
  with DENSE per-direction weights (``[W_in, gH]`` — the torch ``wi``
  layout, no packing), then merged into the gate-grouped step layout once
  per chunk via lane-aligned slice concats (H % 128 == 0), so the
  gate-grouped xg tensor never exists in HBM.  An earlier revision
  projected through pre-scattered ``[W_in, 2gH]`` columns
  (``ops.rnn._pack_dir_cols``) — bit-equivalent but 2x the MACs (half the
  output columns were structural zeros); the dense form halves projection
  FLOPs and weight VMEM and keeps the per-step body untouched (the merge
  happens outside the sequential chain).
* **Saved-gates backward.**  The forward emits (r, z, n, hg_n) residuals;
  the VJP kernel consumes them in reverse block order, accumulates dwh/dbh/
  dwi/dbi in VMEM f32 scratch, and emits dx for both directions (the
  backward direction's dx already un-flipped via reversed-map stores).

Numerics: matmuls run in the input dtype with f32 accumulation; the hidden
carry and gate math are f32 (same as ops/rnn_pallas.py).  The projection is
bit-exact vs the XLA path (zero-padded weight columns contribute exact 0.0).

Reference semantics covered: ``torch.nn.GRU(bidirectional=True)`` per-layer
behavior incl. ``pack_padded_sequence`` masking (``networks.py:40-43``,
``networks.py:143-167``); gate layout/initialization parity is inherited from
``ops.rnn``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 11 * 1024 * 1024


def _itemsize(dtype) -> int:
    return jnp.dtype(dtype).itemsize


def _pick_chunk(t: int, b: int, h: int, w_in: int, dtype) -> int | None:
    """Largest chunk whose double-buffered blocks + weights + scratch fit."""
    sz = _itemsize(dtype)
    w2 = 2 * h
    gw2 = 6 * h
    g3 = 3 * h
    for chunk in (32, 16, 8, 4):
        if t % chunk:
            continue
        streams_fwd = (
            2 * chunk * b * w_in * sz  # xf + xr views
            + 2 * chunk * b * h * sz   # ysf + ysb
            + chunk * b * 4 * w2 * sz  # res
        ) * 2  # double buffering
        streams_bwd = (
            2 * chunk * b * w_in * sz      # xf + xr views
            + chunk * b * 4 * w2 * sz      # res
            + chunk * b * w2 * sz          # hp
            + 2 * chunk * b * h * sz       # dyf + dyb
            + 2 * chunk * b * w_in * sz    # dxf + dxb
        ) * 2
        scratch = (
            chunk * b * gw2 * 4            # xg2 chunk f32 (fwd) / dxg2 (bwd)
            + 3 * chunk * b * g3 * 4       # dense-dot + flip temporaries
            + b * w2 * 4 * 2               # h / dh carry
        )
        weights = (
            2 * w_in * g3 * sz + w2 * gw2 * sz + 3 * gw2 * 4
            + 2 * w_in * g3 * 4 + w2 * gw2 * 4  # bwd f32 accumulators
        )
        if max(streams_fwd, streams_bwd) + scratch + weights <= _VMEM_BUDGET:
            return chunk
    return None


def supported(t: int, b: int, h: int, w_in: int, dtype) -> bool:
    if b % 8 or h % 128:
        return False
    pick = (_pick_chunk_split(t, b, h, w_in, dtype, 3, False)
            if SPLIT else _pick_chunk(t, b, h, w_in, dtype))
    return pick is not None


# ----------------------------------------------------------------- forward


def _fwd_kernel(t_total, chunk, h, train,
                xf_ref, xr_ref, wif_ref, wib_ref, bi2_ref, wh2_ref, bh2_ref,
                len_ref, ysf_ref, ysb_ref, *rest):
    if train:
        res_ref, h_ref, xg2_ref = rest
    else:
        h_ref, xg2_ref = rest
        res_ref = None
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    b = xf_ref.shape[1]
    w_in = xf_ref.shape[2]
    g3 = 3 * h

    # per-chunk DENSE input projections on the MXU (torch wi layout — no
    # structural-zero columns), merged into the gate-grouped step layout
    # once per chunk, off the sequential chain
    xf2d = xf_ref[:].reshape(chunk * b, w_in)
    xr2d = xr_ref[:].reshape(chunk * b, w_in)
    xgf = jnp.dot(
        xf2d, wif_ref[:], preferred_element_type=jnp.float32
    ).reshape(chunk, b, g3)
    xgb = jnp.dot(
        xr2d, wib_ref[:], preferred_element_type=jnp.float32
    ).reshape(chunk, b, g3)
    # flip the reversed view's rows so xg2[t] pairs fwd step t with bwd
    # step t directly (static slice-concat: Mosaic has no `rev` lowering)
    xgb = jnp.concatenate(
        [xgb[chunk - 1 - u] for u in range(chunk)], axis=0
    ).reshape(chunk, b, g3)
    # gate-grouped merge: [r_f r_b z_f z_b n_f n_b], lane-aligned H chunks
    xg2_ref[:] = jnp.concatenate(
        [p for g in range(3)
         for p in (xgf[:, :, g * h:(g + 1) * h],
                   xgb[:, :, g * h:(g + 1) * h])],
        axis=-1)

    lengths = len_ref[:]  # [B, 1] int32

    def body(t, _):
        s = i * chunk + t  # kernel step
        g_x = xg2_ref[t] + bi2_ref[0]
        h2 = h_ref[:]
        hg = jnp.dot(
            h2.astype(wh2_ref.dtype), wh2_ref[:],
            preferred_element_type=jnp.float32,
        ) + bh2_ref[0]
        w2 = 2 * h
        r = jax.nn.sigmoid(g_x[:, :w2] + hg[:, :w2])
        z = jax.nn.sigmoid(g_x[:, w2:2 * w2] + hg[:, w2:2 * w2])
        hg_n = hg[:, 2 * w2:]
        n = jnp.tanh(g_x[:, 2 * w2:] + r * hg_n)
        hn = (1.0 - z) * n + z * h2
        # freeze the BACKWARD chain's carry on flipped-prefix padding
        # (s < T - len); the forward chain is prefix-valid and needs none
        valid_b = s >= t_total - lengths  # [B, 1]
        hn = jnp.concatenate(
            [hn[:, :h], jnp.where(valid_b, hn[:, h:], h2[:, h:])], axis=-1
        )
        h_ref[:] = hn
        ysf_ref[t] = hn[:, :h].astype(ysf_ref.dtype)
        # reversed-map output: leaves the kernel in ORIGINAL time order
        ysb_ref[chunk - 1 - t] = hn[:, h:].astype(ysb_ref.dtype)
        if res_ref is not None:
            res_ref[t] = jnp.concatenate(
                [r, z, n, hg_n], axis=-1).astype(res_ref.dtype)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=True)


def _fwd_call(x, wif2, wib2, bi2, wh2, bh2, lengths, *, train, interpret):
    t, b, w_in = x.shape
    h = wh2.shape[0] // 2
    chunk = _pick_chunk(t, b, h, w_in, x.dtype)
    n = t // chunk
    gw2 = 6 * h
    kern = functools.partial(_fwd_kernel, t, chunk, h, train)
    out_shape = [
        jax.ShapeDtypeStruct((t, b, h), x.dtype),  # ysf (original order)
        jax.ShapeDtypeStruct((t, b, h), x.dtype),  # ysb (original order)
    ]
    out_specs = [
        pl.BlockSpec((chunk, b, h), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, b, h), lambda i, n=n: (n - 1 - i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if train:
        out_shape.append(
            jax.ShapeDtypeStruct((t, b, 8 * h), x.dtype))  # res, kernel order
        out_specs.append(
            pl.BlockSpec((chunk, b, 8 * h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((chunk, b, w_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), lambda i, n=n: (n - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, 3 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, 3 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * h, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((b, 2 * h), jnp.float32),       # h carry
            pltpu.VMEM((chunk, b, gw2), jnp.float32),  # gate-grouped xg
        ],
        interpret=interpret,
    )(x, x, wif2, wib2, bi2.reshape(1, gw2), wh2, bh2.reshape(1, gw2),
      lengths.astype(jnp.int32).reshape(b, 1))


# ---------------------------------------------------------------- backward


def _bwd_kernel(t_total, chunk, h, n_chunks,
                xf_ref, xr_ref, res_ref, hp_ref, dyf_ref, dyb_ref,
                wif_ref, wib_ref, wh2_ref, len_ref,
                dxf_ref, dxb_ref, dwif_ref, dwib_ref, dbi2_ref,
                dwh2_ref, dbh2_ref,
                dh_ref, dxg_ref):
    i = pl.program_id(0)
    c = n_chunks - 1 - i  # kernel chunk index (reverse walk)
    b = xf_ref.shape[1]
    w_in = xf_ref.shape[2]
    w2 = 2 * h
    gw2 = 6 * h

    @pl.when(i == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dwif_ref[:] = jnp.zeros_like(dwif_ref)
        dwib_ref[:] = jnp.zeros_like(dwib_ref)
        dbi2_ref[:] = jnp.zeros_like(dbi2_ref)
        dwh2_ref[:] = jnp.zeros_like(dwh2_ref)
        dbh2_ref[:] = jnp.zeros_like(dbh2_ref)

    lengths = len_ref[:]  # [B, 1] int32

    def body(j, _):
        t = chunk - 1 - j  # reverse within chunk
        s = c * chunk + t
        res = res_ref[t]
        r = res[:, :w2]
        z = res[:, w2:2 * w2]
        nn = res[:, 2 * w2:3 * w2]
        hg_n = res[:, 3 * w2:]
        hp = hp_ref[t]
        dy = jnp.concatenate(
            [dyf_ref[t], dyb_ref[chunk - 1 - t]], axis=-1
        ).astype(jnp.float32)
        dh = dy + dh_ref[:]
        dz = dh * (hp - nn)
        dpre_n = dh * (1.0 - z) * (1.0 - nn * nn)
        dpre_r = dpre_n * hg_n * r * (1.0 - r)
        dpre_z = dz * z * (1.0 - z)
        # freeze VJP: on padded backward-chain steps (s < T - len) the step
        # was the identity hn = h2 — gate grads vanish and dh passes through
        valid_b = s >= t_total - lengths  # [B, 1]
        mask_b = valid_b.astype(jnp.float32)
        dpre_n = jnp.concatenate(
            [dpre_n[:, :h], dpre_n[:, h:] * mask_b], axis=-1)
        dpre_r = jnp.concatenate(
            [dpre_r[:, :h], dpre_r[:, h:] * mask_b], axis=-1)
        dpre_z = jnp.concatenate(
            [dpre_z[:, :h], dpre_z[:, h:] * mask_b], axis=-1)
        dxg_ref[t] = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)
        dhg = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=-1)
        dhg_c = dhg.astype(wh2_ref.dtype)
        # wh2 is block-diagonal per direction, so frozen backward lanes get
        # zero from the matmul; the z-mix must pass dh through on them
        dh_new = dh * z + jnp.dot(
            dhg_c, wh2_ref[:].T, preferred_element_type=jnp.float32)
        dh_ref[:] = jnp.concatenate(
            [dh_new[:, :h], jnp.where(valid_b, dh_new[:, h:], dh[:, h:])],
            axis=-1,
        )
        dwh2_ref[:] += jnp.dot(
            hp.T.astype(wh2_ref.dtype), dhg_c,
            preferred_element_type=jnp.float32)
        dbh2_ref[:] += jnp.sum(dhg, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=True)

    # per-chunk projection backward on the MXU: de-interleave the
    # gate-grouped dxg into per-direction DENSE layouts (lane-aligned H
    # slices), then half-width dots against the dense weights
    dxg3 = dxg_ref[:]  # [chunk, b, 6h] gate-grouped
    xf2d = xf_ref[:].reshape(chunk * b, w_in)
    xr2d = xr_ref[:].reshape(chunk * b, w_in)
    dxg_f = jnp.concatenate(
        [dxg3[:, :, g * w2:g * w2 + h] for g in range(3)], axis=-1
    ).reshape(chunk * b, 3 * h)
    dxg_b = jnp.concatenate(
        [dxg3[:, :, g * w2 + h:(g + 1) * w2] for g in range(3)], axis=-1)
    # the reversed view pairs x_rev row u with kernel step CH-1-u
    # (static slice-concat: Mosaic has no `rev` lowering)
    dxg_b = jnp.concatenate(
        [dxg_b[chunk - 1 - u] for u in range(chunk)], axis=0
    ).reshape(chunk * b, 3 * h)
    dxf_ref[:] = jnp.dot(
        dxg_f.astype(wif_ref.dtype), wif_ref[:].T,
        preferred_element_type=jnp.float32
    ).reshape(chunk, b, w_in).astype(dxf_ref.dtype)
    dxb_ref[:] = jnp.dot(
        dxg_b.astype(wib_ref.dtype), wib_ref[:].T,
        preferred_element_type=jnp.float32
    ).reshape(chunk, b, w_in).astype(dxb_ref.dtype)
    dwif_ref[:] += jnp.dot(
        xf2d.T, dxg_f.astype(xf2d.dtype), preferred_element_type=jnp.float32)
    dwib_ref[:] += jnp.dot(
        xr2d.T, dxg_b.astype(xr2d.dtype), preferred_element_type=jnp.float32)
    dbi2_ref[:] += jnp.sum(
        dxg3.reshape(chunk * b, gw2), axis=0, keepdims=True)


def _bwd_call(x, res, hp2, dyf, dyb, wif2, wib2, wh2, lengths, *, interpret):
    t, b, w_in = x.shape
    h = wh2.shape[0] // 2
    chunk = _pick_chunk(t, b, h, w_in, x.dtype)
    n = t // chunk
    gw2 = 6 * h
    kern = functools.partial(_bwd_kernel, t, chunk, h, n)
    rev = lambda i, n=n: (n - 1 - i, 0, 0)  # noqa: E731
    fwdm = lambda i: (i, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((chunk, b, w_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, 8 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, 2 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, h), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, 3 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, 3 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * h, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b, w_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, 3 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, 3 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * h, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, w_in), x.dtype),   # dxf
            jax.ShapeDtypeStruct((t, b, w_in), x.dtype),   # dxb (orig order)
            jax.ShapeDtypeStruct((w_in, 3 * h), jnp.float32),
            jax.ShapeDtypeStruct((w_in, 3 * h), jnp.float32),
            jax.ShapeDtypeStruct((1, gw2), jnp.float32),
            jax.ShapeDtypeStruct((2 * h, gw2), jnp.float32),
            jax.ShapeDtypeStruct((1, gw2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, 2 * h), jnp.float32),
            pltpu.VMEM((chunk, b, gw2), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, res, hp2, dyf, dyb, wif2, wib2, wh2,
      lengths.astype(jnp.int32).reshape(b, 1))


# --------------------------------------------------------------- custom vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def gru_bidir_fused(x, wif2, wib2, bi2, wh2, bh2, lengths, interpret=False):
    """One bidirectional GRU layer over ``x [T, B, W_in]`` (time-major).

    Input weights are DENSE per direction — ``wif2/wib2 [W_in, 3H]``, the
    torch ``weight_ih`` layout, no packing; the gate-grouped merge happens
    in-kernel.  ``wh2 [2H, 6H]`` (``_pack_gate_grouped``), ``bi2/bh2 [6H]``
    (``_pack_gate_grouped_vec``).  Returns ``(ys_f [T, B, H], ys_b
    [T, B, H])`` BOTH in original time order, unmasked (caller masks).
    ``lengths [B]`` drives the backward chain's carry freeze.
    """
    ysf, ysb = _fwd_call(
        x, wif2, wib2, bi2, wh2, bh2, lengths, train=False,
        interpret=interpret)
    return ysf, ysb


def _vjp_fwd(x, wif2, wib2, bi2, wh2, bh2, lengths, interpret):
    ysf, ysb, res = _fwd_call(
        x, wif2, wib2, bi2, wh2, bh2, lengths, train=True,
        interpret=interpret)
    return (ysf, ysb), (x, wif2, wib2, wh2, lengths, ysf, ysb, res)


def _vjp_bwd(interpret, resids, dy):
    # lengths is a regular (integer) primal arg; its cotangent is None
    x, wif2, wib2, wh2, lengths, ysf, ysb, res = resids
    dyf, dyb = dy
    t = x.shape[0]
    h = wh2.shape[0] // 2
    # kernel-order hidden state: [ys_f[s], ys_b_kernel[s]]; ys_b is emitted
    # in original order, so kernel order = global flip (pure lax.rev)
    ys_k = jnp.concatenate([ysf, jnp.flip(ysb, axis=0)], axis=-1)
    hp2 = jnp.concatenate([jnp.zeros_like(ys_k[:1]), ys_k[:-1]], axis=0)
    dxf, dxb, dwif, dwib, dbi2, dwh2, dbh2 = _bwd_call(
        x, res, hp2, dyf, dyb, wif2, wib2, wh2, lengths,
        interpret=interpret)
    dx = (dxf.astype(jnp.float32) + dxb.astype(jnp.float32)).astype(x.dtype)
    return (dx, dwif.astype(wif2.dtype), dwib.astype(wib2.dtype),
            dbi2.reshape(-1), dwh2.astype(wh2.dtype), dbh2.reshape(-1),
            None)


gru_bidir_fused.defvjp(_vjp_fwd, _vjp_bwd)


# ================================================================== LSTM
# Same fused-layer design for torch.nn.LSTM(bidirectional=True): 4 gates
# (i, f, g, o) with BOTH biases folded into the input projection, cell state
# carried alongside h, and saved residuals (i, f, g, o, tanh_c).  The cell
# sequence cs is emitted in KERNEL order (it is only a backward residual,
# never a model output, so no un-flipping output ref is needed).


def _pick_chunk_lstm(t: int, b: int, h: int, w_in: int, dtype) -> int | None:
    sz = _itemsize(dtype)
    w2 = 2 * h
    gw2 = 8 * h
    for chunk in (32, 16, 8, 4):
        if t % chunk:
            continue
        streams_fwd = (
            2 * chunk * b * w_in * sz
            + 2 * chunk * b * h * sz        # ysf + ysb
            + chunk * b * w2 * sz           # cs
            + chunk * b * 5 * w2 * sz       # res
        ) * 2
        streams_bwd = (
            2 * chunk * b * w_in * sz
            + chunk * b * 5 * w2 * sz       # res
            + 2 * chunk * b * w2 * sz       # hp + cp
            + 2 * chunk * b * h * sz        # dyf + dyb
            + 2 * chunk * b * w_in * sz     # dxf + dxb
        ) * 2
        g4 = 4 * h
        scratch = (
            chunk * b * gw2 * 4
            + 3 * chunk * b * g4 * 4        # dense-dot + flip temporaries
            + b * w2 * 4 * 4                # h, c / dh, dc carries
        )
        weights = (
            2 * w_in * g4 * sz + w2 * gw2 * sz + gw2 * 4
            + 2 * w_in * g4 * 4 + w2 * gw2 * 4
        )
        if max(streams_fwd, streams_bwd) + scratch + weights <= _VMEM_BUDGET:
            return chunk
    return None


def lstm_supported(t: int, b: int, h: int, w_in: int, dtype) -> bool:
    if b % 8 or h % 128:
        return False
    pick = (_pick_chunk_split(t, b, h, w_in, dtype, 4, True)
            if SPLIT else _pick_chunk_lstm(t, b, h, w_in, dtype))
    return pick is not None


def _lstm_fwd_kernel(t_total, chunk, h, train,
                     xf_ref, xr_ref, wif_ref, wib_ref, bi2_ref, wh2_ref,
                     len_ref, ysf_ref, ysb_ref, cs_ref, *rest):
    if train:
        res_ref, h_ref, c_ref, xg2_ref = rest
    else:
        h_ref, c_ref, xg2_ref = rest
        res_ref = None
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    b = xf_ref.shape[1]
    w_in = xf_ref.shape[2]
    g4 = 4 * h
    w2 = 2 * h

    # dense per-direction projections + once-per-chunk gate-grouped merge
    # (see the GRU forward kernel note)
    xf2d = xf_ref[:].reshape(chunk * b, w_in)
    xr2d = xr_ref[:].reshape(chunk * b, w_in)
    xgf = jnp.dot(
        xf2d, wif_ref[:], preferred_element_type=jnp.float32
    ).reshape(chunk, b, g4)
    xgb = jnp.dot(
        xr2d, wib_ref[:], preferred_element_type=jnp.float32
    ).reshape(chunk, b, g4)
    xgb = jnp.concatenate(
        [xgb[chunk - 1 - u] for u in range(chunk)], axis=0
    ).reshape(chunk, b, g4)
    xg2_ref[:] = jnp.concatenate(
        [p for g in range(4)
         for p in (xgf[:, :, g * h:(g + 1) * h],
                   xgb[:, :, g * h:(g + 1) * h])],
        axis=-1)

    lengths = len_ref[:]  # [B, 1]

    def body(t, _):
        s = i * chunk + t
        g_x = xg2_ref[t] + bi2_ref[0]
        h2 = h_ref[:]
        c2 = c_ref[:]
        gates = g_x + jnp.dot(
            h2.astype(wh2_ref.dtype), wh2_ref[:],
            preferred_element_type=jnp.float32,
        )
        ii = jax.nn.sigmoid(gates[:, :w2])
        f = jax.nn.sigmoid(gates[:, w2:2 * w2])
        g = jnp.tanh(gates[:, 2 * w2:3 * w2])
        o = jax.nn.sigmoid(gates[:, 3 * w2:])
        c = f * c2 + ii * g
        tanh_c = jnp.tanh(c)
        hn = o * tanh_c
        valid_b = s >= t_total - lengths  # [B, 1]
        hn = jnp.concatenate(
            [hn[:, :h], jnp.where(valid_b, hn[:, h:], h2[:, h:])], axis=-1)
        c = jnp.concatenate(
            [c[:, :h], jnp.where(valid_b, c[:, h:], c2[:, h:])], axis=-1)
        h_ref[:] = hn
        c_ref[:] = c
        ysf_ref[t] = hn[:, :h].astype(ysf_ref.dtype)
        ysb_ref[chunk - 1 - t] = hn[:, h:].astype(ysb_ref.dtype)
        cs_ref[t] = c.astype(cs_ref.dtype)  # kernel order (bwd residual)
        if res_ref is not None:
            res_ref[t] = jnp.concatenate(
                [ii, f, g, o, tanh_c], axis=-1).astype(res_ref.dtype)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=True)


def _lstm_fwd_call(x, wif2, wib2, bi2, wh2, lengths, *, train, interpret):
    t, b, w_in = x.shape
    h = wh2.shape[0] // 2
    chunk = _pick_chunk_lstm(t, b, h, w_in, x.dtype)
    n = t // chunk
    gw2 = 8 * h
    kern = functools.partial(_lstm_fwd_kernel, t, chunk, h, train)
    out_shape = [
        jax.ShapeDtypeStruct((t, b, h), x.dtype),      # ysf (orig order)
        jax.ShapeDtypeStruct((t, b, h), x.dtype),      # ysb (orig order)
        jax.ShapeDtypeStruct((t, b, 2 * h), x.dtype),  # cs (kernel order)
    ]
    out_specs = [
        pl.BlockSpec((chunk, b, h), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, b, h), lambda i, n=n: (n - 1 - i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, b, 2 * h), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((b, 2 * h), jnp.float32),
        pltpu.VMEM((b, 2 * h), jnp.float32),
        pltpu.VMEM((chunk, b, gw2), jnp.float32),  # gate-grouped xg
    ]
    if train:
        out_shape.append(jax.ShapeDtypeStruct((t, b, 10 * h), x.dtype))
        out_specs.append(
            pl.BlockSpec((chunk, b, 10 * h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((chunk, b, w_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), lambda i, n=n: (n - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * h, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, x, wif2, wib2, bi2.reshape(1, gw2), wh2,
      lengths.astype(jnp.int32).reshape(b, 1))


def _lstm_bwd_kernel(t_total, chunk, h, n_chunks,
                     xf_ref, xr_ref, res_ref, hp_ref, cp_ref, dyf_ref,
                     dyb_ref, wif_ref, wib_ref, wh2_ref, len_ref,
                     dxf_ref, dxb_ref, dwif_ref, dwib_ref, dbi2_ref,
                     dwh2_ref, dh_ref, dc_ref, dxg_ref):
    i = pl.program_id(0)
    c_idx = n_chunks - 1 - i
    b = xf_ref.shape[1]
    w_in = xf_ref.shape[2]
    w2 = 2 * h
    gw2 = 8 * h

    @pl.when(i == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dwif_ref[:] = jnp.zeros_like(dwif_ref)
        dwib_ref[:] = jnp.zeros_like(dwib_ref)
        dbi2_ref[:] = jnp.zeros_like(dbi2_ref)
        dwh2_ref[:] = jnp.zeros_like(dwh2_ref)

    lengths = len_ref[:]

    def body(j, _):
        t = chunk - 1 - j
        s = c_idx * chunk + t
        res = res_ref[t]
        ii = res[:, :w2]
        f = res[:, w2:2 * w2]
        g = res[:, 2 * w2:3 * w2]
        o = res[:, 3 * w2:4 * w2]
        tanh_c = res[:, 4 * w2:]
        hp = hp_ref[t]
        cp = cp_ref[t]
        dy = jnp.concatenate(
            [dyf_ref[t], dyb_ref[chunk - 1 - t]], axis=-1
        ).astype(jnp.float32)
        dh = dy + dh_ref[:]
        do = dh * tanh_c
        dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_ref[:]
        dpre_i = dc * g * ii * (1.0 - ii)
        dpre_f = dc * cp * f * (1.0 - f)
        dpre_g = dc * ii * (1.0 - g * g)
        dpre_o = do * o * (1.0 - o)
        valid_b = s >= t_total - lengths
        mask_b = valid_b.astype(jnp.float32)

        def _fz(a):  # zero gate grads on frozen backward-chain lanes
            return jnp.concatenate([a[:, :h], a[:, h:] * mask_b], axis=-1)

        dgates = jnp.concatenate(
            [_fz(dpre_i), _fz(dpre_f), _fz(dpre_g), _fz(dpre_o)], axis=-1)
        dxg_ref[t] = dgates
        dgates_c = dgates.astype(wh2_ref.dtype)
        dh_new = jnp.dot(
            dgates_c, wh2_ref[:].T, preferred_element_type=jnp.float32)
        dc_new = dc * f
        # frozen steps are identity in BOTH h and c: pass dh/dc through
        dh_ref[:] = jnp.concatenate(
            [dh_new[:, :h], jnp.where(valid_b, dh_new[:, h:], dh[:, h:])],
            axis=-1)
        dc_ref[:] = jnp.concatenate(
            [dc_new[:, :h], jnp.where(valid_b, dc_new[:, h:], dc[:, h:])],
            axis=-1)
        dwh2_ref[:] += jnp.dot(
            hp.T.astype(wh2_ref.dtype), dgates_c,
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=True)

    # de-interleave gate-grouped dxg into per-direction dense layouts,
    # then half-width dots (see the GRU backward kernel note)
    dxg3 = dxg_ref[:]  # [chunk, b, 8h] gate-grouped
    xf2d = xf_ref[:].reshape(chunk * b, w_in)
    xr2d = xr_ref[:].reshape(chunk * b, w_in)
    dxg_f = jnp.concatenate(
        [dxg3[:, :, g * w2:g * w2 + h] for g in range(4)], axis=-1
    ).reshape(chunk * b, 4 * h)
    dxg_b = jnp.concatenate(
        [dxg3[:, :, g * w2 + h:(g + 1) * w2] for g in range(4)], axis=-1)
    dxg_b = jnp.concatenate(
        [dxg_b[chunk - 1 - u] for u in range(chunk)], axis=0
    ).reshape(chunk * b, 4 * h)
    dxf_ref[:] = jnp.dot(
        dxg_f.astype(wif_ref.dtype), wif_ref[:].T,
        preferred_element_type=jnp.float32
    ).reshape(chunk, b, w_in).astype(dxf_ref.dtype)
    dxb_ref[:] = jnp.dot(
        dxg_b.astype(wib_ref.dtype), wib_ref[:].T,
        preferred_element_type=jnp.float32
    ).reshape(chunk, b, w_in).astype(dxb_ref.dtype)
    dwif_ref[:] += jnp.dot(
        xf2d.T, dxg_f.astype(xf2d.dtype), preferred_element_type=jnp.float32)
    dwib_ref[:] += jnp.dot(
        xr2d.T, dxg_b.astype(xr2d.dtype), preferred_element_type=jnp.float32)
    dbi2_ref[:] += jnp.sum(
        dxg3.reshape(chunk * b, gw2), axis=0, keepdims=True)


def _lstm_bwd_call(x, res, hp2, cp2, dyf, dyb, wif2, wib2, wh2, lengths, *,
                   interpret):
    t, b, w_in = x.shape
    h = wh2.shape[0] // 2
    chunk = _pick_chunk_lstm(t, b, h, w_in, x.dtype)
    n = t // chunk
    gw2 = 8 * h
    kern = functools.partial(_lstm_bwd_kernel, t, chunk, h, n)
    rev = lambda i, n=n: (n - 1 - i, 0, 0)  # noqa: E731
    fwdm = lambda i: (i, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((chunk, b, w_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, 10 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, 2 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, 2 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, h), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * h, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b, w_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * h, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, w_in), x.dtype),
            jax.ShapeDtypeStruct((t, b, w_in), x.dtype),
            jax.ShapeDtypeStruct((w_in, 4 * h), jnp.float32),
            jax.ShapeDtypeStruct((w_in, 4 * h), jnp.float32),
            jax.ShapeDtypeStruct((1, gw2), jnp.float32),
            jax.ShapeDtypeStruct((2 * h, gw2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, 2 * h), jnp.float32),
            pltpu.VMEM((b, 2 * h), jnp.float32),
            pltpu.VMEM((chunk, b, gw2), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, res, hp2, cp2, dyf, dyb, wif2, wib2, wh2,
      lengths.astype(jnp.int32).reshape(b, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def lstm_bidir_fused(x, wif2, wib2, bi2, wh2, lengths, interpret=False):
    """One bidirectional LSTM layer over ``x [T, B, W_in]`` (time-major).

    Same contract as :func:`gru_bidir_fused` (dense ``wif2/wib2
    [W_in, 4H]``) with the LSTM packing: both biases pre-folded into
    ``bi2`` (``torch.nn.LSTM`` adds bi+bh to every gate), no separate
    hidden bias.  Returns ``(ys_f, ys_b)`` in original time order,
    unmasked.
    """
    ysf, ysb, _ = _lstm_fwd_call(
        x, wif2, wib2, bi2, wh2, lengths, train=False, interpret=interpret)
    return ysf, ysb


def _lstm_vjp_fwd(x, wif2, wib2, bi2, wh2, lengths, interpret):
    ysf, ysb, cs, res = _lstm_fwd_call(
        x, wif2, wib2, bi2, wh2, lengths, train=True, interpret=interpret)
    return (ysf, ysb), (x, wif2, wib2, wh2, lengths, ysf, ysb, cs, res)


def _lstm_vjp_bwd(interpret, resids, dy):
    x, wif2, wib2, wh2, lengths, ysf, ysb, cs, res = resids
    dyf, dyb = dy
    ys_k = jnp.concatenate([ysf, jnp.flip(ysb, axis=0)], axis=-1)
    hp2 = jnp.concatenate([jnp.zeros_like(ys_k[:1]), ys_k[:-1]], axis=0)
    cp2 = jnp.concatenate([jnp.zeros_like(cs[:1]), cs[:-1]], axis=0)
    dxf, dxb, dwif, dwib, dbi2, dwh2 = _lstm_bwd_call(
        x, res, hp2, cp2, dyf, dyb, wif2, wib2, wh2, lengths,
        interpret=interpret)
    dx = (dxf.astype(jnp.float32) + dxb.astype(jnp.float32)).astype(x.dtype)
    return (dx, dwif.astype(wif2.dtype), dwib.astype(wib2.dtype),
            dbi2.reshape(-1), dwh2.astype(wh2.dtype), None)


lstm_bidir_fused.defvjp(_lstm_vjp_fwd, _lstm_vjp_bwd)


# ====================================================== direction-split step
# Variant of the fused layer kernels with the two direction chains fully
# DECOUPLED in the step body.  The merged body multiplies the [B, 2H]
# direction-concat carry against a block-diagonal [2H, g*2H] hidden weight:
# half the contraction rows are structural zeros for every output column,
# i.e. 2x the MACs of the real recurrence on the serial critical path (the
# same waste the dense input projections removed off-path).  Here each
# direction runs its own dense [B, H] @ [H, gH] hidden matmul (torch
# ``weight_hh`` layout, contraction H instead of 2H) and its own [B, H]
# gate math; the two chains share no value, so the scheduler can overlap
# direction-b's MXU pass with direction-f's VPU gates (and vice versa)
# inside the unrolled step loop.  Bonus: no gate-grouped layout exists
# anywhere — weights, biases, residuals, and gate grads all stay in torch
# per-direction layouts, so the backward needs no de-interleave and the
# glue needs no _pack_gate_grouped scatter (or its VJP transpose), and the
# resident weight/accumulator VMEM drops ~4x (no zero blocks).
# PVA_RNN_SPLIT selects the variant at trace time (A/B:
# tools/ab_rnn_split.py; docs/PERF_NOTES.md round-4 split-step entry).
# Split is the DEFAULT: interleaved TPU A/Bs win every bench config
# (bigru train 7.81 -> 6.40 ms/step +22%, bilstm 5.80 -> 5.12 +13%,
# attn 10.74 -> 9.86 +9%); PVA_RNN_SPLIT=0 restores the merged body.

import os as _os

SPLIT = _os.environ.get("PVA_RNN_SPLIT", "1") == "1"

# Chunk-batched hidden weight-gradient accumulation in the split backward
# kernels: the per-step form runs a [H, B] @ [B, gH] dwh dot (B=64-deep
# contraction, MXU half-fed) plus a bias reduce INSIDE the strictly
# sequential step loop; the batched form contracts the whole chunk in one
# [H, chunk*B] @ [chunk*B, gH] dot per direction after the loop, off the
# serial chain.  PVA_RNN_CHUNK_DW=0 restores the per-step accumulation
# (A/B: tools/ab_rnn_chunk_dw.py; grad parity for the =0 fallback is pinned
# by tests/test_rnn_fused.py::test_fused_layer_chunk_dw_off_grads_match).
CHUNK_DW = _os.environ.get("PVA_RNN_CHUNK_DW", "1") == "1"

# In-kernel previous-state tiles in the split backward: the legacy glue
# builds hp (and LSTM cp) as FULL [T, B, H] planes via
# ``concatenate(zeros, ys[:-1])`` — XLA lowers that to a pad that copies the
# whole plane through HBM (round-5 trace: 8 pads x ~44 us = 0.35 ms/step of
# the 5.8 ms bigru step, plus the ysb flip).  With INKERNEL_HP the backward
# kernel instead streams ys directly (same bytes, the planes already exist)
# plus a tiny [n_chunks, B, H] chunk-boundary-row input, and builds the
# one-step-shifted hp tile in VMEM (flip + shift are block-local
# slice-concats).  Values are bit-identical — hp rows are the same ys rows.
# PVA_RNN_INKERNEL_HP=0 restores the pad-glue path (A/B:
# tools/ab_rnn_inkernel_hp.py; both paths grad-parity-tested).
INKERNEL_HP = _os.environ.get("PVA_RNN_INKERNEL_HP", "1") == "1"

# Fused layer boundaries in the time-major GRU stack: layers 1+ consume the
# previous layer's raw direction halves and run the stack glue's boundary
# ops (concat * mask -> strided hash dropout) inside the kernel via
# ``gru_bidir_fused_split_bnd`` — removing the [T, B, 2H] concat
# materialization, the dropout where pass, and their VJPs (round-5
# by-source table: ~0.6 ms of the 5.6 ms bigru step).  The dropout stream
# is bit-identical to the glue's ``hashmask.keep_mask`` draw, so flipping
# the flag never changes values (pinned by
# tests/test_rnn_fused.py::test_fused_boundary_matches_glue).
# MEASURED NEGATIVE (bigru train 5.873 vs 5.746 ms/step, -2.2% —
# tools/ab_rnn_fused_boundary.py, 2026-08-20): each boundary element is
# consumed by BOTH direction streams (fwdm + rev block views), so the
# in-kernel form pays mask+hash+where TWICE per element on the projection
# stage's critical path, outweighing the saved one-pass XLA fusions; the
# glue also left the x operand a plain prefetchable input stream.  Kept
# OFF as a tested escape hatch (docs/PERF_NOTES.md round-5 entry).
FUSED_BOUNDARY = _os.environ.get("PVA_RNN_FUSED_BOUNDARY", "0") == "1"

# Explicit scoped-VMEM limit for the split kernels, mirroring the flash
# kernel's fix for the round-4 lesson: the chipless AOT compile helper (the
# driver's compile-check path and profile_step_trace) enforces the default
# 16M scoped-VMEM limit STRICTLY while runtime JIT admits an over-budget
# Mosaic stack — so any temporary not covered by the estimate (here the
# CHUNK_DW batched weight-grad temporaries) could pass every runtime test
# and still OOM the driver.  The chunk PICK keeps its historical budget
# (`include_dw=False`) so picked chunks — and hence measured perf — are
# unchanged; the explicit limit guarantees admission of the full stack
# including the dw temporaries, and the guard test
# (tests/test_rnn_fused.py::test_split_vmem_estimate_within_limit)
# pins estimate(include_dw=True) * 1.3 <= _SPLIT_VMEM_LIMIT for every
# bench-config shape the picker admits.
_SPLIT_VMEM_LIMIT = 40 * 1024 * 1024


def _est_split(chunk, b, h, w_in, dtype, g, lstm, *, include_dw=False):
    """Estimated live VMEM bytes of the split kernels at ``chunk`` (g gates,
    g+1 residuals).  ``include_dw`` adds the CHUNK_DW batched weight-grad
    temporaries materialized after the step loop (per direction: the
    transposed ``hp2d`` copy [H, chunk*B] in the weight dtype, the cast
    gate-grad blocks [chunk*B, gH] in the weight dtype, and the f32 n-block
    product [chunk*B, H])."""
    sz = _itemsize(dtype)
    gh = g * h
    r = g + 1  # residual planes per direction (gates + hg_n / tanh_c)
    streams_fwd = (
        2 * chunk * b * w_in * sz       # xf + xr views
        + 2 * chunk * b * h * sz        # ysf + ysb
        + 2 * chunk * b * r * h * sz    # resf + resb
        + (2 * chunk * b * h * sz if lstm else 0)  # csf + csb
    ) * 2
    streams_bwd = (
        2 * chunk * b * w_in * sz       # xf + xr views
        + 2 * chunk * b * r * h * sz    # resf + resb
        + 2 * chunk * b * h * sz        # hpf + hpb
        + (2 * chunk * b * h * sz if lstm else 0)  # cpf + cpb
        + 2 * chunk * b * h * sz        # dyf + dyb
        + 2 * chunk * b * w_in * sz     # dxf + dxb
    ) * 2
    if include_dw and CHUNK_DW:
        streams_bwd += 2 * (chunk * b * (h + gh) * sz + chunk * b * h * 4)
    if include_dw and INKERNEL_HP:
        # in-kernel previous-state scratch tiles (hp x2, + cp x2 for LSTM)
        streams_bwd += (4 if lstm else 2) * chunk * b * h * sz
    scratch = (
        2 * chunk * b * gh * 4          # xgf + xgb / dxgf + dxgb
        + chunk * b * gh * 4            # flip temporary
        + (4 if lstm else 2) * b * h * 4 * 2  # carries (fwd / bwd)
    )
    weights = (
        (2 * w_in * gh + 2 * h * gh) * sz      # wi + wh, both dirs
        + (2 * w_in * gh + 2 * h * gh) * 4     # bwd f32 accumulators
        + 8 * gh * 4                           # biases + bias grads
    )
    return max(streams_fwd, streams_bwd) + scratch + weights


def _pick_chunk_split(t, b, h, w_in, dtype, g, lstm):
    """VMEM-budgeted chunk for the split kernels.  Deliberately excludes the
    CHUNK_DW temporaries (``include_dw=False``): including them would shrink
    picked chunks (bigru L0 bf16 8 -> 4, f32 4 -> fallback) and change
    measured-good configurations; the explicit ``_SPLIT_VMEM_LIMIT`` on the
    pallas_calls covers the full stack instead."""
    for chunk in (32, 16, 8, 4):
        if t % chunk:
            continue
        if _est_split(chunk, b, h, w_in, dtype, g, lstm) <= _VMEM_BUDGET:
            return chunk
    return None


# ------------------------------------------------------- GRU, split forward


def _boundary_tile(xa_ref, xb_ref, len_ref, base_t, boundary, key, t_total,
                   chunk):
    """Build one maskdropped layer-boundary input tile [chunk, B, 2H] from
    raw previous-layer half blocks (rows in ORIGINAL time order starting at
    global row ``base_t``), mirroring the XLA stack glue exactly:
    ``concat([ysf, ysb]) * mask_tb`` then ``where(km, out * (1/keep), 0)``
    with the identical fmix32 stream (index ``(b*T + t)*2H + c``)."""
    has_drop, thresh, inv_keep = boundary
    b = xa_ref.shape[1]
    h2 = 2 * xa_ref.shape[2]
    xt = jnp.concatenate([xa_ref[:], xb_ref[:]], axis=-1)
    tt = base_t + jax.lax.broadcasted_iota(jnp.int32, (chunk, b, 1), 0)
    valid = tt < len_ref[:].reshape(1, b, 1)
    xt = xt * valid.astype(xt.dtype)
    if has_drop:
        idx = (
            jnp.uint32(base_t * h2)
            + jax.lax.broadcasted_iota(jnp.uint32, (chunk, b, h2), 0)
            * jnp.uint32(h2)
            + jax.lax.broadcasted_iota(jnp.uint32, (chunk, b, h2), 1)
            * jnp.uint32((t_total * h2) & 0xFFFFFFFF)
            + jax.lax.broadcasted_iota(jnp.uint32, (chunk, b, h2), 2)
        )
        km = _fmix32(idx ^ key) < jnp.uint32(thresh)
        xt = jnp.where(km, xt * jnp.asarray(inv_keep, xt.dtype),
                       jnp.zeros((), xt.dtype))
        return xt, valid, km
    return xt, valid, None


def _fmix32(v):
    """murmur3 finalizer (hashmask.fmix32 inlined — uint32 ops only)."""
    v = v ^ (v >> 16)
    v = v * jnp.uint32(0x85EBCA6B)
    v = v ^ (v >> 13)
    v = v * jnp.uint32(0xC2B2AE35)
    v = v ^ (v >> 16)
    return v


def _fwd_kernel_split(t_total, chunk, h, train, n_chunks, boundary, *refs):
    if boundary is not None:
        (xaf_ref, xbf_ref, xar_ref, xbr_ref, *refs) = refs
        if boundary[0]:
            key_ref, *refs = refs
    (xf_ref, xr_ref, wif_ref, wib_ref, bif_ref, bib_ref,
     whf_ref, whb_ref, bhf_ref, bhb_ref, len_ref,
     ysf_ref, ysb_ref, *rest) = ((None, None) + tuple(refs)
                                 if boundary is not None else tuple(refs))
    if train:
        resf_ref, resb_ref, hf_ref, hb_ref, xgf_ref, xgb_ref = rest
    else:
        hf_ref, hb_ref, xgf_ref, xgb_ref = rest
        resf_ref = resb_ref = None
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hf_ref[:] = jnp.zeros_like(hf_ref)
        hb_ref[:] = jnp.zeros_like(hb_ref)

    if boundary is not None:
        b = xaf_ref.shape[1]
        w_in = 2 * xaf_ref.shape[2]
        key = (_fmix32(key_ref[0, 0] + jnp.uint32(0x9E3779B9))
               if boundary[0] else None)
        xf_tile, _, _ = _boundary_tile(
            xaf_ref, xbf_ref, len_ref, i * chunk, boundary, key, t_total,
            chunk)
        xr_tile, _, _ = _boundary_tile(
            xar_ref, xbr_ref, len_ref, (n_chunks - 1 - i) * chunk, boundary,
            key, t_total, chunk)
        xf2d = xf_tile.reshape(chunk * b, w_in)
        xr2d = xr_tile.reshape(chunk * b, w_in)
    else:
        b = xf_ref.shape[1]
        w_in = xf_ref.shape[2]
        xf2d = xf_ref[:].reshape(chunk * b, w_in)
        xr2d = xr_ref[:].reshape(chunk * b, w_in)
    g3 = 3 * h

    # dense per-direction projections (torch wi layout), off the chain
    xgf_ref[:] = jnp.dot(
        xf2d, wif_ref[:], preferred_element_type=jnp.float32
    ).reshape(chunk, b, g3)
    xgb = jnp.dot(
        xr2d, wib_ref[:], preferred_element_type=jnp.float32
    ).reshape(chunk, b, g3)
    # flip the reversed view's rows so xgb[t] is bwd step t's gates
    # (static slice-concat: Mosaic has no `rev` lowering)
    xgb_ref[:] = jnp.concatenate(
        [xgb[chunk - 1 - u] for u in range(chunk)], axis=0
    ).reshape(chunk, b, g3)

    lengths = len_ref[:]  # [B, 1] int32

    def body(t, _):
        s = i * chunk + t
        gx_f = xgf_ref[t] + bif_ref[0]
        gx_b = xgb_ref[t] + bib_ref[0]
        hf = hf_ref[:]
        hb = hb_ref[:]
        # two independent dense hidden matmuls (contraction H, not 2H)
        hg_f = jnp.dot(
            hf.astype(whf_ref.dtype), whf_ref[:],
            preferred_element_type=jnp.float32) + bhf_ref[0]
        hg_b = jnp.dot(
            hb.astype(whb_ref.dtype), whb_ref[:],
            preferred_element_type=jnp.float32) + bhb_ref[0]
        r_f = jax.nn.sigmoid(gx_f[:, :h] + hg_f[:, :h])
        r_b = jax.nn.sigmoid(gx_b[:, :h] + hg_b[:, :h])
        z_f = jax.nn.sigmoid(gx_f[:, h:2 * h] + hg_f[:, h:2 * h])
        z_b = jax.nn.sigmoid(gx_b[:, h:2 * h] + hg_b[:, h:2 * h])
        hgn_f = hg_f[:, 2 * h:]
        hgn_b = hg_b[:, 2 * h:]
        n_f = jnp.tanh(gx_f[:, 2 * h:] + r_f * hgn_f)
        n_b = jnp.tanh(gx_b[:, 2 * h:] + r_b * hgn_b)
        hn_f = (1.0 - z_f) * n_f + z_f * hf
        # freeze the BACKWARD chain's carry on flipped-prefix padding
        valid_b = s >= t_total - lengths  # [B, 1]
        hn_b = jnp.where(valid_b, (1.0 - z_b) * n_b + z_b * hb, hb)
        hf_ref[:] = hn_f
        hb_ref[:] = hn_b
        ysf_ref[t] = hn_f.astype(ysf_ref.dtype)
        ysb_ref[chunk - 1 - t] = hn_b.astype(ysb_ref.dtype)
        if resf_ref is not None:
            resf_ref[t] = jnp.concatenate(
                [r_f, z_f, n_f, hgn_f], axis=-1).astype(resf_ref.dtype)
            resb_ref[t] = jnp.concatenate(
                [r_b, z_b, n_b, hgn_b], axis=-1).astype(resb_ref.dtype)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=True)


def _fwd_call_split(x, wif, wib, bif, bib, whf, whb, bhf, bhb, lengths, *,
                    train, interpret, halves=None, boundary=None, seed=None):
    """``halves=(xa, xb)`` + ``boundary=(has_drop, thresh, inv_keep)``
    selects the fused-boundary form: the layer input is the previous
    layer's raw direction halves, and the stack glue's
    ``concat * mask [-> dropout]`` runs inside the kernel (``seed`` is the
    boundary's dropout stream seed, a traced uint32 scalar)."""
    if halves is not None:
        xa, xb = halves
        t, b, hh = xa.shape
        w_in = 2 * hh
        dtype = xa.dtype
    else:
        t, b, w_in = x.shape
        dtype = x.dtype
    h = whf.shape[0]
    chunk = _pick_chunk_split(t, b, h, w_in, dtype, 3, False)
    n = t // chunk
    g3 = 3 * h
    kern = functools.partial(_fwd_kernel_split, t, chunk, h, train, n,
                             boundary if halves is not None else None)
    fwdm = lambda i: (i, 0, 0)  # noqa: E731
    rev = lambda i, n=n: (n - 1 - i, 0, 0)  # noqa: E731
    w0 = lambda i: (0, 0)  # noqa: E731
    if halves is not None:
        half_spec = pl.BlockSpec((chunk, b, hh), fwdm,
                                 memory_space=pltpu.VMEM)
        half_spec_r = pl.BlockSpec((chunk, b, hh), rev,
                                   memory_space=pltpu.VMEM)
        x_in_specs = [half_spec, half_spec, half_spec_r, half_spec_r]
        x_ops = [xa, xb, xa, xb]
        if boundary[0]:
            x_in_specs.append(
                pl.BlockSpec((1, 1), w0, memory_space=pltpu.VMEM))
            x_ops.append(seed.astype(jnp.uint32).reshape(1, 1))
    else:
        x_in_specs = [
            pl.BlockSpec((chunk, b, w_in), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), rev, memory_space=pltpu.VMEM),
        ]
        x_ops = [x, x]
    out_shape = [
        jax.ShapeDtypeStruct((t, b, h), dtype),  # ysf (original order)
        jax.ShapeDtypeStruct((t, b, h), dtype),  # ysb (original order)
    ]
    out_specs = [
        pl.BlockSpec((chunk, b, h), fwdm, memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, b, h), rev, memory_space=pltpu.VMEM),
    ]
    if train:  # residuals per direction, kernel order
        out_shape += [jax.ShapeDtypeStruct((t, b, 4 * h), dtype)] * 2
        out_specs += [
            pl.BlockSpec((chunk, b, 4 * h), fwdm, memory_space=pltpu.VMEM)
        ] * 2
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=x_in_specs + [
            pl.BlockSpec((w_in, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), w0, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),           # h carry, fwd dir
            pltpu.VMEM((b, h), jnp.float32),           # h carry, bwd dir
            pltpu.VMEM((chunk, b, g3), jnp.float32),   # xg fwd dir
            pltpu.VMEM((chunk, b, g3), jnp.float32),   # xg bwd dir (flipped)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SPLIT_VMEM_LIMIT),
        interpret=interpret,
    )(*x_ops, wif, wib, bif.reshape(1, g3), bib.reshape(1, g3), whf, whb,
      bhf.reshape(1, g3), bhb.reshape(1, g3),
      lengths.astype(jnp.int32).reshape(b, 1))


# ------------------------------------------------------ GRU, split backward


def _bwd_kernel_split(t_total, chunk, h, n_chunks, inkernel_hp, boundary,
                      *refs):
    if boundary is not None:
        (xaf_ref, xbf_ref, xar_ref, xbr_ref, *refs) = refs
        if boundary[0]:
            key_ref, *refs = refs
        xf_ref = xr_ref = None
    else:
        (xf_ref, xr_ref, *refs) = refs
    if inkernel_hp:
        (resf_ref, resb_ref, ysf_ref, ysb_ref,
         dyf_ref, dyb_ref, wif_ref, wib_ref, whf_ref, whb_ref,
         len_ref, bf_ref, bb_ref, *rest) = refs
        *rest, hpf_t, hpb_t = rest  # hp scratch tiles (built below)
    else:
        (resf_ref, resb_ref, hpf_t, hpb_t,
         dyf_ref, dyb_ref, wif_ref, wib_ref, whf_ref, whb_ref,
         len_ref, *rest) = refs
    if boundary is not None:
        (dxfa_ref, dxfb_ref, dxba_ref, dxbb_ref, *rest) = rest
    else:
        (dxf_ref, dxb_ref, *rest) = rest
    (dwif_ref, dwib_ref, dbif_ref,
     dbib_ref, dwhf_ref, dwhb_ref, dbhf_ref, dbhb_ref,
     dhf_ref, dhb_ref, dxgf_ref, dxgb_ref) = rest
    i = pl.program_id(0)
    c = n_chunks - 1 - i  # kernel chunk index (reverse walk)
    b = resf_ref.shape[1]
    w_in = (2 * xaf_ref.shape[2] if boundary is not None
            else xf_ref.shape[2])
    g3 = 3 * h

    if boundary is not None:
        # rebuild the maskdropped boundary input tiles (identical fmix32
        # stream to the forward) + the boundary VJP multipliers
        key = (_fmix32(key_ref[0, 0] + jnp.uint32(0x9E3779B9))
               if boundary[0] else None)
        xf_tile, valid_f, km_f = _boundary_tile(
            xaf_ref, xbf_ref, len_ref, c * chunk, boundary, key, t_total,
            chunk)
        xr_tile, valid_r, km_r = _boundary_tile(
            xar_ref, xbr_ref, len_ref, (n_chunks - 1 - c) * chunk, boundary,
            key, t_total, chunk)

        def _mul(valid, km):
            m = valid.astype(jnp.float32)
            if km is not None:
                m = m * jnp.where(km, jnp.float32(boundary[2]),
                                  jnp.float32(0.0))
            return m

        mul_f, mul_r = _mul(valid_f, km_f), _mul(valid_r, km_r)

    if inkernel_hp:
        # hp tiles built into VMEM scratch from the ys streams (ref-indexed
        # below — Mosaic has no dynamic_slice on values): fwd dir is a
        # one-row shift (row 0 = the previous chunk's last state, streamed
        # as a [1, B, H] boundary block); bwd dir additionally flips rows,
        # since ysb is stored in ORIGINAL time order (same fwdm + in-block
        # flip convention as dyb).  Row math: kernel step u of kernel-chunk
        # c needs ys_k[c*chunk+u-1]; with the fwdm block holding original
        # rows, that is block row chunk-u for u >= 1 and the boundary row
        # (original row (n-c)*chunk, zeros for c == 0) at u == 0.
        ysb_blk = ysb_ref[:]
        hpf_t[:] = jnp.concatenate(
            [bf_ref[:], ysf_ref[: chunk - 1]], axis=0)
        hpb_t[:] = jnp.concatenate(
            [bb_ref[:]] + [ysb_blk[chunk - u][None] for u in range(1, chunk)],
            axis=0)
    # else: hp planes prebuilt by XLA pad glue arrive as the hpf_t/hpb_t
    # input refs directly

    @pl.when(i == 0)
    def _():
        dhf_ref[:] = jnp.zeros_like(dhf_ref)
        dhb_ref[:] = jnp.zeros_like(dhb_ref)
        dwif_ref[:] = jnp.zeros_like(dwif_ref)
        dwib_ref[:] = jnp.zeros_like(dwib_ref)
        dbif_ref[:] = jnp.zeros_like(dbif_ref)
        dbib_ref[:] = jnp.zeros_like(dbib_ref)
        dwhf_ref[:] = jnp.zeros_like(dwhf_ref)
        dwhb_ref[:] = jnp.zeros_like(dwhb_ref)
        dbhf_ref[:] = jnp.zeros_like(dbhf_ref)
        dbhb_ref[:] = jnp.zeros_like(dbhb_ref)

    lengths = len_ref[:]  # [B, 1] int32

    def body(j, _):
        t = chunk - 1 - j  # reverse within chunk
        s = c * chunk + t
        resf = resf_ref[t]
        resb = resb_ref[t]
        r_f, z_f = resf[:, :h], resf[:, h:2 * h]
        n_f, hgn_f = resf[:, 2 * h:3 * h], resf[:, 3 * h:]
        r_b, z_b = resb[:, :h], resb[:, h:2 * h]
        n_b, hgn_b = resb[:, 2 * h:3 * h], resb[:, 3 * h:]
        dh_f = dyf_ref[t].astype(jnp.float32) + dhf_ref[:]
        dh_b = dyb_ref[chunk - 1 - t].astype(jnp.float32) + dhb_ref[:]
        dz_f = dh_f * (hpf_t[t] - n_f)
        dz_b = dh_b * (hpb_t[t] - n_b)
        dpre_n_f = dh_f * (1.0 - z_f) * (1.0 - n_f * n_f)
        dpre_n_b = dh_b * (1.0 - z_b) * (1.0 - n_b * n_b)
        dpre_r_f = dpre_n_f * hgn_f * r_f * (1.0 - r_f)
        dpre_r_b = dpre_n_b * hgn_b * r_b * (1.0 - r_b)
        dpre_z_f = dz_f * z_f * (1.0 - z_f)
        dpre_z_b = dz_b * z_b * (1.0 - z_b)
        # freeze VJP: padded backward-chain steps were identity — gate grads
        # vanish and dh passes through
        valid_b = s >= t_total - lengths  # [B, 1]
        mask_b = valid_b.astype(jnp.float32)
        dpre_n_b = dpre_n_b * mask_b
        dpre_r_b = dpre_r_b * mask_b
        dpre_z_b = dpre_z_b * mask_b
        dxgf_ref[t] = jnp.concatenate(
            [dpre_r_f, dpre_z_f, dpre_n_f], axis=-1)  # torch gate order
        dxgb_ref[t] = jnp.concatenate(
            [dpre_r_b, dpre_z_b, dpre_n_b], axis=-1)
        dhg_f = jnp.concatenate(
            [dpre_r_f, dpre_z_f, dpre_n_f * r_f], axis=-1)
        dhg_b = jnp.concatenate(
            [dpre_r_b, dpre_z_b, dpre_n_b * r_b], axis=-1)
        dhg_f_c = dhg_f.astype(whf_ref.dtype)
        dhg_b_c = dhg_b.astype(whb_ref.dtype)
        # two independent dense transposed matmuls (contraction 3H, not 6H)
        dhf_ref[:] = dh_f * z_f + jnp.dot(
            dhg_f_c, whf_ref[:].T, preferred_element_type=jnp.float32)
        dh_b_new = dh_b * z_b + jnp.dot(
            dhg_b_c, whb_ref[:].T, preferred_element_type=jnp.float32)
        dhb_ref[:] = jnp.where(valid_b, dh_b_new, dh_b)
        if not CHUNK_DW:
            dwhf_ref[:] += jnp.dot(
                hpf_t[t].T.astype(whf_ref.dtype), dhg_f_c,
                preferred_element_type=jnp.float32)
            dwhb_ref[:] += jnp.dot(
                hpb_t[t].T.astype(whb_ref.dtype), dhg_b_c,
                preferred_element_type=jnp.float32)
            dbhf_ref[:] += jnp.sum(dhg_f, axis=0, keepdims=True)
            dbhb_ref[:] += jnp.sum(dhg_b, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=True)

    if CHUNK_DW:
        # chunk-batched hidden weight/bias grads, OFF the serial chain: the
        # per-step form above runs a [H, B] @ [B, 3H] dot (64-deep
        # contraction — MXU half-fed) inside the strictly sequential loop;
        # here ONE [H, chunk*B] @ [chunk*B, 3H] dot per direction contracts
        # the whole chunk at once.  dhg is rebuilt from the dxg scratch +
        # saved r (dhg == dxg except the n block, which carries an extra
        # *r); the n-block product is the only temporary, so the dot splits
        # into rz- and n-column blocks to avoid a full-width concat temp.
        for (dxg_ref, res_ref, hp_ref, dwh_ref, dbh_ref, w_ref) in (
                (dxgf_ref, resf_ref, hpf_t, dwhf_ref, dbhf_ref, whf_ref),
                (dxgb_ref, resb_ref, hpb_t, dwhb_ref, dbhb_ref, whb_ref)):
            hp2d = hp_ref[:].reshape(chunk * b, h).T.astype(w_ref.dtype)
            dxg3 = dxg_ref[:]
            rz = dxg3[:, :, :2 * h].reshape(chunk * b, 2 * h)
            ng = (dxg3[:, :, 2 * h:] * res_ref[:][:, :, :h]
                  ).reshape(chunk * b, h)
            dwh_ref[:, :2 * h] += jnp.dot(
                hp2d, rz.astype(w_ref.dtype),
                preferred_element_type=jnp.float32)
            dwh_ref[:, 2 * h:] += jnp.dot(
                hp2d, ng.astype(w_ref.dtype),
                preferred_element_type=jnp.float32)
            dbh_ref[:, :2 * h] += jnp.sum(rz, axis=0, keepdims=True)
            dbh_ref[:, 2 * h:] += jnp.sum(ng, axis=0, keepdims=True)

    # per-chunk projection backward: gate grads are ALREADY dense per
    # direction — no de-interleave, just the flip pairing x_rev rows
    if boundary is not None:
        xf2d = xf_tile.reshape(chunk * b, w_in)
        xr2d = xr_tile.reshape(chunk * b, w_in)
    else:
        xf2d = xf_ref[:].reshape(chunk * b, w_in)
        xr2d = xr_ref[:].reshape(chunk * b, w_in)
    dxg_f = dxgf_ref[:].reshape(chunk * b, g3)
    dxg_b = jnp.concatenate(
        [dxgb_ref[chunk - 1 - u] for u in range(chunk)], axis=0
    ).reshape(chunk * b, g3)
    dx_f = jnp.dot(
        dxg_f.astype(wif_ref.dtype), wif_ref[:].T,
        preferred_element_type=jnp.float32
    ).reshape(chunk, b, w_in)
    dx_b = jnp.dot(
        dxg_b.astype(wib_ref.dtype), wib_ref[:].T,
        preferred_element_type=jnp.float32
    ).reshape(chunk, b, w_in)
    if boundary is not None:
        # boundary VJP in-kernel: d(ys half) = dx * mask [* km/keep],
        # halves split along the feature axis (replaces the glue's
        # dropout-where VJP + concat-VJP slices)
        hh = w_in // 2
        dx_f = dx_f * mul_f
        dx_b = dx_b * mul_r
        dxfa_ref[:] = dx_f[:, :, :hh].astype(dxfa_ref.dtype)
        dxfb_ref[:] = dx_f[:, :, hh:].astype(dxfb_ref.dtype)
        dxba_ref[:] = dx_b[:, :, :hh].astype(dxba_ref.dtype)
        dxbb_ref[:] = dx_b[:, :, hh:].astype(dxbb_ref.dtype)
    else:
        dxf_ref[:] = dx_f.astype(dxf_ref.dtype)
        dxb_ref[:] = dx_b.astype(dxb_ref.dtype)
    dwif_ref[:] += jnp.dot(
        xf2d.T, dxg_f.astype(xf2d.dtype), preferred_element_type=jnp.float32)
    dwib_ref[:] += jnp.dot(
        xr2d.T, dxg_b.astype(xr2d.dtype), preferred_element_type=jnp.float32)
    dbif_ref[:] += jnp.sum(dxg_f, axis=0, keepdims=True)
    dbib_ref[:] += jnp.sum(dxg_b, axis=0, keepdims=True)


def _bwd_call_split(x, resf, resb, ysf, ysb, dyf, dyb, wif, wib, whf, whb,
                    lengths, *, interpret, halves=None, boundary=None,
                    seed=None):
    if halves is not None:
        xa, xb = halves
        t, b, hh = xa.shape
        w_in = 2 * hh
        dtype = xa.dtype
    else:
        t, b, w_in = x.shape
        dtype = x.dtype
    h = whf.shape[0]
    chunk = _pick_chunk_split(t, b, h, w_in, dtype, 3, False)
    n = t // chunk
    g3 = 3 * h
    inkernel_hp = INKERNEL_HP
    if inkernel_hp:
        # per-chunk boundary rows [n, B, H]: fwd-dir chunk c starts from
        # ysf[c*chunk - 1] (zeros at c=0); bwd-dir kernel-chunk c starts
        # from ysb[(n - c) * chunk] in original order (zeros at c=0) — tiny
        # strided gathers instead of full-plane pad copies
        hp_ops = (
            jnp.concatenate(
                [jnp.zeros_like(ysf[:1]), ysf[chunk - 1::chunk][: n - 1]],
                axis=0),
            jnp.concatenate(
                [jnp.zeros_like(ysb[:1]),
                 jnp.flip(ysb[chunk::chunk], axis=0)], axis=0),
        )
    else:  # legacy pad-glue hp planes, kernel order (flip ysb first)
        hpf = jnp.concatenate([jnp.zeros_like(ysf[:1]), ysf[:-1]], axis=0)
        ysb_k = jnp.flip(ysb, axis=0)
        hpb = jnp.concatenate([jnp.zeros_like(ysb_k[:1]), ysb_k[:-1]],
                              axis=0)
        ysf, ysb = hpf, hpb
        hp_ops = ()
    kern = functools.partial(_bwd_kernel_split, t, chunk, h, n, inkernel_hp,
                             boundary if halves is not None else None)
    rev = lambda i, n=n: (n - 1 - i, 0, 0)  # noqa: E731
    fwdm = lambda i: (i, 0, 0)  # noqa: E731
    w0 = lambda i: (0, 0)  # noqa: E731
    if halves is not None:
        half_rev = pl.BlockSpec((chunk, b, hh), rev, memory_space=pltpu.VMEM)
        half_fwd = pl.BlockSpec((chunk, b, hh), fwdm,
                                memory_space=pltpu.VMEM)
        x_in_specs = [half_rev, half_rev, half_fwd, half_fwd]
        x_ops = [xa, xb, xa, xb]
        if boundary[0]:
            x_in_specs.append(
                pl.BlockSpec((1, 1), w0, memory_space=pltpu.VMEM))
            x_ops.append(seed.astype(jnp.uint32).reshape(1, 1))
        dx_specs = [half_rev, half_rev, half_fwd, half_fwd]
        dx_shapes = [jax.ShapeDtypeStruct((t, b, hh), dtype)] * 4
    else:
        x_in_specs = [
            pl.BlockSpec((chunk, b, w_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), fwdm, memory_space=pltpu.VMEM),
        ]
        x_ops = [x, x]
        dx_specs = [
            pl.BlockSpec((chunk, b, w_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), fwdm, memory_space=pltpu.VMEM),
        ]
        dx_shapes = [
            jax.ShapeDtypeStruct((t, b, w_in), dtype),   # dxf
            jax.ShapeDtypeStruct((t, b, w_in), dtype),   # dxb (orig order)
        ]
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=x_in_specs + [
            pl.BlockSpec((chunk, b, 4 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, 4 * h), rev, memory_space=pltpu.VMEM),
            # ysf (or legacy hpf): kernel order = original order.  ysb is
            # streamed in ORIGINAL order (fwdm + in-kernel flip, the dyb
            # convention); the legacy hpb plane is pre-flipped, so rev.
            pl.BlockSpec((chunk, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, h), fwdm if inkernel_hp else rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, h), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), w0, memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((1, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), rev, memory_space=pltpu.VMEM),
        ] if inkernel_hp else []),
        out_specs=dx_specs + [
            pl.BlockSpec((w_in, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g3), w0, memory_space=pltpu.VMEM),
        ],
        out_shape=dx_shapes + [
            jax.ShapeDtypeStruct((w_in, g3), jnp.float32),
            jax.ShapeDtypeStruct((w_in, g3), jnp.float32),
            jax.ShapeDtypeStruct((1, g3), jnp.float32),
            jax.ShapeDtypeStruct((1, g3), jnp.float32),
            jax.ShapeDtypeStruct((h, g3), jnp.float32),
            jax.ShapeDtypeStruct((h, g3), jnp.float32),
            jax.ShapeDtypeStruct((1, g3), jnp.float32),
            jax.ShapeDtypeStruct((1, g3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((chunk, b, g3), jnp.float32),
            pltpu.VMEM((chunk, b, g3), jnp.float32),
        ] + ([
            pltpu.VMEM((chunk, b, h), ysf.dtype),  # hpf tile
            pltpu.VMEM((chunk, b, h), ysb.dtype),  # hpb tile
        ] if inkernel_hp else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SPLIT_VMEM_LIMIT),
        interpret=interpret,
    )(*x_ops, resf, resb, ysf, ysb, dyf, dyb, wif, wib, whf, whb,
      lengths.astype(jnp.int32).reshape(b, 1), *hp_ops)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def gru_bidir_fused_split(x, wif, wib, bif, bib, whf, whb, bhf, bhb,
                          lengths, interpret=False):
    """Direction-split variant of :func:`gru_bidir_fused`.

    ALL weights are the raw torch per-direction layouts: ``wif/wib
    [W_in, 3H]`` (``weight_ih``), ``whf/whb [H, 3H]`` (``weight_hh``),
    ``bif/bib/bhf/bhb [3H]``.  Same output contract: ``(ys_f, ys_b)``
    both ``[T, B, H]`` in original time order, unmasked.
    """
    ysf, ysb = _fwd_call_split(
        x, wif, wib, bif, bib, whf, whb, bhf, bhb, lengths, train=False,
        interpret=interpret)
    return ysf, ysb


def _vjp_fwd_split(x, wif, wib, bif, bib, whf, whb, bhf, bhb, lengths,
                   interpret):
    ysf, ysb, resf, resb = _fwd_call_split(
        x, wif, wib, bif, bib, whf, whb, bhf, bhb, lengths, train=True,
        interpret=interpret)
    return (ysf, ysb), (x, wif, wib, whf, whb, lengths, ysf, ysb, resf, resb)


def _vjp_bwd_split(interpret, resids, dy):
    x, wif, wib, whf, whb, lengths, ysf, ysb, resf, resb = resids
    dyf, dyb = dy
    # previous-state construction (full hp planes or in-kernel tiles per
    # INKERNEL_HP) lives in _bwd_call_split
    (dxf, dxb, dwif, dwib, dbif, dbib, dwhf, dwhb, dbhf,
     dbhb) = _bwd_call_split(
        x, resf, resb, ysf, ysb, dyf, dyb, wif, wib, whf, whb, lengths,
        interpret=interpret)
    dx = (dxf.astype(jnp.float32) + dxb.astype(jnp.float32)).astype(x.dtype)
    return (dx, dwif.astype(wif.dtype), dwib.astype(wib.dtype),
            dbif.reshape(-1), dbib.reshape(-1),
            dwhf.astype(whf.dtype), dwhb.astype(whb.dtype),
            dbhf.reshape(-1), dbhb.reshape(-1), None)


gru_bidir_fused_split.defvjp(_vjp_fwd_split, _vjp_bwd_split)


# ----------------------------------------- GRU, split + fused layer boundary


def _bnd(thresh, inv_keep):
    return (thresh is not None, 0 if thresh is None else int(thresh),
            1.0 if inv_keep is None else float(inv_keep))


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def gru_bidir_fused_split_bnd(xa, xb, wif, wib, bif, bib, whf, whb, bhf,
                              bhb, lengths, seed, interpret=False,
                              thresh=None, inv_keep=None):
    """:func:`gru_bidir_fused_split` consuming the PREVIOUS layer's raw
    direction halves ``xa/xb [T, B, H]`` with the stack glue's boundary ops
    — ``concat([ysf, ysb]) * mask_tb`` then (train) the strided fmix32
    hash dropout — fused INTO the kernel (identical mask stream to
    ``hashmask.keep_mask(strides=(2H, T*2H, 1))``; ``seed`` is the
    boundary's uint32 stream seed, ignored when ``thresh`` is None).
    Removes the boundary's XLA materializations: the [T, B, 2H] concat
    write, the dropout where pass, the concat-VJP slices, and the dropout
    VJP (round-5 by-source table, rnn.py:358/:370)."""
    ysf, ysb = _fwd_call_split(
        None, wif, wib, bif, bib, whf, whb, bhf, bhb, lengths, train=False,
        interpret=interpret, halves=(xa, xb),
        boundary=_bnd(thresh, inv_keep), seed=seed)
    return ysf, ysb


def _vjp_fwd_split_bnd(xa, xb, wif, wib, bif, bib, whf, whb, bhf, bhb,
                       lengths, seed, interpret, thresh, inv_keep):
    ysf, ysb, resf, resb = _fwd_call_split(
        None, wif, wib, bif, bib, whf, whb, bhf, bhb, lengths, train=True,
        interpret=interpret, halves=(xa, xb),
        boundary=_bnd(thresh, inv_keep), seed=seed)
    return (ysf, ysb), (xa, xb, wif, wib, whf, whb, lengths, seed,
                        ysf, ysb, resf, resb)


def _vjp_bwd_split_bnd(interpret, thresh, inv_keep, resids, dy):
    (xa, xb, wif, wib, whf, whb, lengths, seed, ysf, ysb, resf,
     resb) = resids
    dyf, dyb = dy
    (dxfa, dxfb, dxba, dxbb, dwif, dwib, dbif, dbib, dwhf, dwhb, dbhf,
     dbhb) = _bwd_call_split(
        None, resf, resb, ysf, ysb, dyf, dyb, wif, wib, whf, whb, lengths,
        interpret=interpret, halves=(xa, xb),
        boundary=_bnd(thresh, inv_keep), seed=seed)
    dxa = (dxfa.astype(jnp.float32) + dxba.astype(jnp.float32)
           ).astype(xa.dtype)
    dxb_ = (dxfb.astype(jnp.float32) + dxbb.astype(jnp.float32)
            ).astype(xb.dtype)
    return (dxa, dxb_, dwif.astype(wif.dtype), dwib.astype(wib.dtype),
            dbif.reshape(-1), dbib.reshape(-1),
            dwhf.astype(whf.dtype), dwhb.astype(whb.dtype),
            dbhf.reshape(-1), dbhb.reshape(-1), None, None)


gru_bidir_fused_split_bnd.defvjp(_vjp_fwd_split_bnd, _vjp_bwd_split_bnd)


# ------------------------------------------------------ LSTM, split forward


def _lstm_fwd_kernel_split(t_total, chunk, h, train,
                           xf_ref, xr_ref, wif_ref, wib_ref, bif_ref,
                           bib_ref, whf_ref, whb_ref, len_ref,
                           ysf_ref, ysb_ref, csf_ref, csb_ref, *rest):
    if train:
        resf_ref, resb_ref, hf_ref, hb_ref, cf_ref, cb_ref, \
            xgf_ref, xgb_ref = rest
    else:
        hf_ref, hb_ref, cf_ref, cb_ref, xgf_ref, xgb_ref = rest
        resf_ref = resb_ref = None
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hf_ref[:] = jnp.zeros_like(hf_ref)
        hb_ref[:] = jnp.zeros_like(hb_ref)
        cf_ref[:] = jnp.zeros_like(cf_ref)
        cb_ref[:] = jnp.zeros_like(cb_ref)

    b = xf_ref.shape[1]
    w_in = xf_ref.shape[2]
    g4 = 4 * h

    xf2d = xf_ref[:].reshape(chunk * b, w_in)
    xr2d = xr_ref[:].reshape(chunk * b, w_in)
    xgf_ref[:] = jnp.dot(
        xf2d, wif_ref[:], preferred_element_type=jnp.float32
    ).reshape(chunk, b, g4)
    xgb = jnp.dot(
        xr2d, wib_ref[:], preferred_element_type=jnp.float32
    ).reshape(chunk, b, g4)
    xgb_ref[:] = jnp.concatenate(
        [xgb[chunk - 1 - u] for u in range(chunk)], axis=0
    ).reshape(chunk, b, g4)

    lengths = len_ref[:]  # [B, 1]

    def body(t, _):
        s = i * chunk + t
        gx_f = xgf_ref[t] + bif_ref[0]
        gx_b = xgb_ref[t] + bib_ref[0]
        hf = hf_ref[:]
        hb = hb_ref[:]
        cf = cf_ref[:]
        cb = cb_ref[:]
        gates_f = gx_f + jnp.dot(
            hf.astype(whf_ref.dtype), whf_ref[:],
            preferred_element_type=jnp.float32)
        gates_b = gx_b + jnp.dot(
            hb.astype(whb_ref.dtype), whb_ref[:],
            preferred_element_type=jnp.float32)
        ii_f = jax.nn.sigmoid(gates_f[:, :h])
        ii_b = jax.nn.sigmoid(gates_b[:, :h])
        f_f = jax.nn.sigmoid(gates_f[:, h:2 * h])
        f_b = jax.nn.sigmoid(gates_b[:, h:2 * h])
        g_f = jnp.tanh(gates_f[:, 2 * h:3 * h])
        g_b = jnp.tanh(gates_b[:, 2 * h:3 * h])
        o_f = jax.nn.sigmoid(gates_f[:, 3 * h:])
        o_b = jax.nn.sigmoid(gates_b[:, 3 * h:])
        cn_f = f_f * cf + ii_f * g_f
        tc_f = jnp.tanh(cn_f)
        hn_f = o_f * tc_f
        valid_b = s >= t_total - lengths  # [B, 1]
        cn_b_raw = f_b * cb + ii_b * g_b
        tc_b = jnp.tanh(cn_b_raw)
        cn_b = jnp.where(valid_b, cn_b_raw, cb)
        hn_b = jnp.where(valid_b, o_b * tc_b, hb)
        hf_ref[:] = hn_f
        hb_ref[:] = hn_b
        cf_ref[:] = cn_f
        cb_ref[:] = cn_b
        ysf_ref[t] = hn_f.astype(ysf_ref.dtype)
        ysb_ref[chunk - 1 - t] = hn_b.astype(ysb_ref.dtype)
        csf_ref[t] = cn_f.astype(csf_ref.dtype)  # kernel order (residual)
        csb_ref[t] = cn_b.astype(csb_ref.dtype)
        if resf_ref is not None:
            resf_ref[t] = jnp.concatenate(
                [ii_f, f_f, g_f, o_f, tc_f], axis=-1).astype(resf_ref.dtype)
            resb_ref[t] = jnp.concatenate(
                [ii_b, f_b, g_b, o_b, tc_b], axis=-1).astype(resb_ref.dtype)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=True)


def _lstm_fwd_call_split(x, wif, wib, bif2, bib2, whf, whb, lengths, *,
                         train, interpret):
    t, b, w_in = x.shape
    h = whf.shape[0]
    chunk = _pick_chunk_split(t, b, h, w_in, x.dtype, 4, True)
    n = t // chunk
    g4 = 4 * h
    kern = functools.partial(_lstm_fwd_kernel_split, t, chunk, h, train)
    fwdm = lambda i: (i, 0, 0)  # noqa: E731
    rev = lambda i, n=n: (n - 1 - i, 0, 0)  # noqa: E731
    w0 = lambda i: (0, 0)  # noqa: E731
    out_shape = [
        jax.ShapeDtypeStruct((t, b, h), x.dtype),  # ysf (orig order)
        jax.ShapeDtypeStruct((t, b, h), x.dtype),  # ysb (orig order)
        jax.ShapeDtypeStruct((t, b, h), x.dtype),  # csf (kernel order)
        jax.ShapeDtypeStruct((t, b, h), x.dtype),  # csb (kernel order)
    ]
    out_specs = [
        pl.BlockSpec((chunk, b, h), fwdm, memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, b, h), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, b, h), fwdm, memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, b, h), fwdm, memory_space=pltpu.VMEM),
    ]
    if train:
        out_shape += [jax.ShapeDtypeStruct((t, b, 5 * h), x.dtype)] * 2
        out_specs += [
            pl.BlockSpec((chunk, b, 5 * h), fwdm, memory_space=pltpu.VMEM)
        ] * 2
    scratch = [
        pltpu.VMEM((b, h), jnp.float32),          # hf carry
        pltpu.VMEM((b, h), jnp.float32),          # hb carry
        pltpu.VMEM((b, h), jnp.float32),          # cf carry
        pltpu.VMEM((b, h), jnp.float32),          # cb carry
        pltpu.VMEM((chunk, b, g4), jnp.float32),  # xg fwd dir
        pltpu.VMEM((chunk, b, g4), jnp.float32),  # xg bwd dir (flipped)
    ]
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((chunk, b, w_in), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), w0, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SPLIT_VMEM_LIMIT),
        interpret=interpret,
    )(x, x, wif, wib, bif2.reshape(1, g4), bib2.reshape(1, g4), whf, whb,
      lengths.astype(jnp.int32).reshape(b, 1))


# ----------------------------------------------------- LSTM, split backward


def _lstm_bwd_kernel_split(t_total, chunk, h, n_chunks, inkernel_hp, *refs):
    if inkernel_hp:
        (xf_ref, xr_ref, resf_ref, resb_ref, ysf_ref, ysb_ref,
         csf_ref, csb_ref, dyf_ref, dyb_ref,
         wif_ref, wib_ref, whf_ref, whb_ref, len_ref,
         bf_ref, bb_ref, cbf_ref, cbb_ref, *rest) = refs
        *rest, hpf_t, hpb_t, cpf_t, cpb_t = rest  # scratch tiles
    else:
        (xf_ref, xr_ref, resf_ref, resb_ref, hpf_t, hpb_t,
         cpf_t, cpb_t, dyf_ref, dyb_ref,
         wif_ref, wib_ref, whf_ref, whb_ref, len_ref, *rest) = refs
    (dxf_ref, dxb_ref, dwif_ref, dwib_ref, dbif_ref,
     dbib_ref, dwhf_ref, dwhb_ref,
     dhf_ref, dhb_ref, dcf_ref, dcb_ref,
     dxgf_ref, dxgb_ref) = rest
    i = pl.program_id(0)
    c_idx = n_chunks - 1 - i
    b = xf_ref.shape[1]
    w_in = xf_ref.shape[2]
    g4 = 4 * h

    if inkernel_hp:
        # previous-state tiles built into VMEM scratch (see the GRU kernel
        # note; ref-indexed — Mosaic has no dynamic_slice on values).
        # ysf: original==kernel order -> one-row shift with a boundary row.
        # ysb: ORIGINAL order (fwdm block + in-block flip, dyb convention).
        # csf/csb: saved in KERNEL order for both directions -> pure
        # one-row shifts, no flip.
        ysb_blk = ysb_ref[:]
        hpf_t[:] = jnp.concatenate(
            [bf_ref[:], ysf_ref[: chunk - 1]], axis=0)
        hpb_t[:] = jnp.concatenate(
            [bb_ref[:]] + [ysb_blk[chunk - u][None] for u in range(1, chunk)],
            axis=0)
        cpf_t[:] = jnp.concatenate(
            [cbf_ref[:], csf_ref[: chunk - 1]], axis=0)
        cpb_t[:] = jnp.concatenate(
            [cbb_ref[:], csb_ref[: chunk - 1]], axis=0)
    # else: planes prebuilt by XLA pad glue arrive as the *_t input refs

    @pl.when(i == 0)
    def _():
        dhf_ref[:] = jnp.zeros_like(dhf_ref)
        dhb_ref[:] = jnp.zeros_like(dhb_ref)
        dcf_ref[:] = jnp.zeros_like(dcf_ref)
        dcb_ref[:] = jnp.zeros_like(dcb_ref)
        dwif_ref[:] = jnp.zeros_like(dwif_ref)
        dwib_ref[:] = jnp.zeros_like(dwib_ref)
        dbif_ref[:] = jnp.zeros_like(dbif_ref)
        dbib_ref[:] = jnp.zeros_like(dbib_ref)
        dwhf_ref[:] = jnp.zeros_like(dwhf_ref)
        dwhb_ref[:] = jnp.zeros_like(dwhb_ref)

    lengths = len_ref[:]

    def body(j, _):
        t = chunk - 1 - j
        s = c_idx * chunk + t
        resf = resf_ref[t]
        resb = resb_ref[t]
        ii_f, f_f = resf[:, :h], resf[:, h:2 * h]
        g_f, o_f, tc_f = (resf[:, 2 * h:3 * h], resf[:, 3 * h:4 * h],
                          resf[:, 4 * h:])
        ii_b, f_b = resb[:, :h], resb[:, h:2 * h]
        g_b, o_b, tc_b = (resb[:, 2 * h:3 * h], resb[:, 3 * h:4 * h],
                          resb[:, 4 * h:])
        dh_f = dyf_ref[t].astype(jnp.float32) + dhf_ref[:]
        dh_b = dyb_ref[chunk - 1 - t].astype(jnp.float32) + dhb_ref[:]
        do_f = dh_f * tc_f
        do_b = dh_b * tc_b
        dc_f = dh_f * o_f * (1.0 - tc_f * tc_f) + dcf_ref[:]
        dc_b = dh_b * o_b * (1.0 - tc_b * tc_b) + dcb_ref[:]
        dpre_i_f = dc_f * g_f * ii_f * (1.0 - ii_f)
        dpre_i_b = dc_b * g_b * ii_b * (1.0 - ii_b)
        dpre_f_f = dc_f * cpf_t[t] * f_f * (1.0 - f_f)
        dpre_f_b = dc_b * cpb_t[t] * f_b * (1.0 - f_b)
        dpre_g_f = dc_f * ii_f * (1.0 - g_f * g_f)
        dpre_g_b = dc_b * ii_b * (1.0 - g_b * g_b)
        dpre_o_f = do_f * o_f * (1.0 - o_f)
        dpre_o_b = do_b * o_b * (1.0 - o_b)
        valid_b = s >= t_total - lengths
        mask_b = valid_b.astype(jnp.float32)
        dgates_f = jnp.concatenate(
            [dpre_i_f, dpre_f_f, dpre_g_f, dpre_o_f], axis=-1)
        dgates_b = jnp.concatenate(
            [dpre_i_b, dpre_f_b, dpre_g_b, dpre_o_b], axis=-1) * mask_b
        dxgf_ref[t] = dgates_f
        dxgb_ref[t] = dgates_b
        dgates_f_c = dgates_f.astype(whf_ref.dtype)
        dgates_b_c = dgates_b.astype(whb_ref.dtype)
        dhf_ref[:] = jnp.dot(
            dgates_f_c, whf_ref[:].T, preferred_element_type=jnp.float32)
        dh_b_new = jnp.dot(
            dgates_b_c, whb_ref[:].T, preferred_element_type=jnp.float32)
        dcf_ref[:] = dc_f * f_f
        # frozen steps are identity in BOTH h and c: pass dh/dc through
        dhb_ref[:] = jnp.where(valid_b, dh_b_new, dh_b)
        dcb_ref[:] = jnp.where(valid_b, dc_b * f_b, dc_b)
        if not CHUNK_DW:
            dwhf_ref[:] += jnp.dot(
                hpf_t[t].T.astype(whf_ref.dtype), dgates_f_c,
                preferred_element_type=jnp.float32)
            dwhb_ref[:] += jnp.dot(
                hpb_t[t].T.astype(whb_ref.dtype), dgates_b_c,
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0, unroll=True)

    if CHUNK_DW:
        # chunk-batched hidden weight grads, OFF the serial chain (see the
        # GRU split backward note) — for LSTM the stored dxg scratch IS
        # dgates, so one [H, chunk*B] @ [chunk*B, 4H] dot per direction
        # replaces `chunk` serial 64-deep dots with no temporaries at all.
        dwhf_ref[:] += jnp.dot(
            hpf_t[:].reshape(chunk * b, h).T.astype(whf_ref.dtype),
            dxgf_ref[:].reshape(chunk * b, g4).astype(whf_ref.dtype),
            preferred_element_type=jnp.float32)
        dwhb_ref[:] += jnp.dot(
            hpb_t[:].reshape(chunk * b, h).T.astype(whb_ref.dtype),
            dxgb_ref[:].reshape(chunk * b, g4).astype(whb_ref.dtype),
            preferred_element_type=jnp.float32)

    xf2d = xf_ref[:].reshape(chunk * b, w_in)
    xr2d = xr_ref[:].reshape(chunk * b, w_in)
    dxg_f = dxgf_ref[:].reshape(chunk * b, g4)
    dxg_b = jnp.concatenate(
        [dxgb_ref[chunk - 1 - u] for u in range(chunk)], axis=0
    ).reshape(chunk * b, g4)
    dxf_ref[:] = jnp.dot(
        dxg_f.astype(wif_ref.dtype), wif_ref[:].T,
        preferred_element_type=jnp.float32
    ).reshape(chunk, b, w_in).astype(dxf_ref.dtype)
    dxb_ref[:] = jnp.dot(
        dxg_b.astype(wib_ref.dtype), wib_ref[:].T,
        preferred_element_type=jnp.float32
    ).reshape(chunk, b, w_in).astype(dxb_ref.dtype)
    dwif_ref[:] += jnp.dot(
        xf2d.T, dxg_f.astype(xf2d.dtype), preferred_element_type=jnp.float32)
    dwib_ref[:] += jnp.dot(
        xr2d.T, dxg_b.astype(xr2d.dtype), preferred_element_type=jnp.float32)
    dbif_ref[:] += jnp.sum(dxg_f, axis=0, keepdims=True)
    dbib_ref[:] += jnp.sum(dxg_b, axis=0, keepdims=True)


def _lstm_bwd_call_split(x, resf, resb, ysf, ysb, csf, csb, dyf, dyb,
                         wif, wib, whf, whb, lengths, *, interpret):
    t, b, w_in = x.shape
    h = whf.shape[0]
    chunk = _pick_chunk_split(t, b, h, w_in, x.dtype, 4, True)
    n = t // chunk
    g4 = 4 * h
    inkernel_hp = INKERNEL_HP
    if inkernel_hp:
        # chunk-boundary rows [n, B, H] per stream (see the GRU call note);
        # csf/csb are saved in KERNEL order for both directions, so their
        # boundaries index kernel-order rows directly
        hp_ops = (
            jnp.concatenate(
                [jnp.zeros_like(ysf[:1]), ysf[chunk - 1::chunk][: n - 1]],
                axis=0),
            jnp.concatenate(
                [jnp.zeros_like(ysb[:1]),
                 jnp.flip(ysb[chunk::chunk], axis=0)], axis=0),
            jnp.concatenate(
                [jnp.zeros_like(csf[:1]), csf[chunk - 1::chunk][: n - 1]],
                axis=0),
            jnp.concatenate(
                [jnp.zeros_like(csb[:1]), csb[chunk - 1::chunk][: n - 1]],
                axis=0),
        )
    else:  # legacy pad-glue planes
        hpf = jnp.concatenate([jnp.zeros_like(ysf[:1]), ysf[:-1]], axis=0)
        ysb_k = jnp.flip(ysb, axis=0)
        hpb = jnp.concatenate([jnp.zeros_like(ysb_k[:1]), ysb_k[:-1]],
                              axis=0)
        cpf = jnp.concatenate([jnp.zeros_like(csf[:1]), csf[:-1]], axis=0)
        cpb = jnp.concatenate([jnp.zeros_like(csb[:1]), csb[:-1]], axis=0)
        ysf, ysb, csf, csb = hpf, hpb, cpf, cpb
        hp_ops = ()
    kern = functools.partial(_lstm_bwd_kernel_split, t, chunk, h, n,
                             inkernel_hp)
    rev = lambda i, n=n: (n - 1 - i, 0, 0)  # noqa: E731
    fwdm = lambda i: (i, 0, 0)  # noqa: E731
    w0 = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((chunk, b, w_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, 5 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, 5 * h), rev, memory_space=pltpu.VMEM),
            # ysf/hpf (kernel==original order); ysb streams in ORIGINAL
            # order under inkernel (fwdm + in-block flip), the legacy hpb
            # plane is pre-flipped (rev); cs both kernel order
            pl.BlockSpec((chunk, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, h), fwdm if inkernel_hp else rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, h), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), w0, memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((1, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), rev, memory_space=pltpu.VMEM),
        ] if inkernel_hp else []),
        out_specs=[
            pl.BlockSpec((chunk, b, w_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), w0, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), w0, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, w_in), x.dtype),
            jax.ShapeDtypeStruct((t, b, w_in), x.dtype),
            jax.ShapeDtypeStruct((w_in, g4), jnp.float32),
            jax.ShapeDtypeStruct((w_in, g4), jnp.float32),
            jax.ShapeDtypeStruct((1, g4), jnp.float32),
            jax.ShapeDtypeStruct((1, g4), jnp.float32),
            jax.ShapeDtypeStruct((h, g4), jnp.float32),
            jax.ShapeDtypeStruct((h, g4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((chunk, b, g4), jnp.float32),
            pltpu.VMEM((chunk, b, g4), jnp.float32),
        ] + ([
            pltpu.VMEM((chunk, b, h), ysf.dtype),  # hpf tile
            pltpu.VMEM((chunk, b, h), ysb.dtype),  # hpb tile
            pltpu.VMEM((chunk, b, h), csf.dtype),  # cpf tile
            pltpu.VMEM((chunk, b, h), csb.dtype),  # cpb tile
        ] if inkernel_hp else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SPLIT_VMEM_LIMIT),
        interpret=interpret,
    )(x, x, resf, resb, ysf, ysb, csf, csb, dyf, dyb, wif, wib, whf, whb,
      lengths.astype(jnp.int32).reshape(b, 1), *hp_ops)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def lstm_bidir_fused_split(x, wif, wib, bif2, bib2, whf, whb, lengths,
                           interpret=False):
    """Direction-split variant of :func:`lstm_bidir_fused`.

    Raw torch per-direction layouts: ``wif/wib [W_in, 4H]``, ``whf/whb
    [H, 4H]``; ``bif2/bib2 [4H]`` carry BOTH biases pre-folded
    (``torch.nn.LSTM`` adds bi+bh to every gate).
    """
    ysf, ysb, _, _ = _lstm_fwd_call_split(
        x, wif, wib, bif2, bib2, whf, whb, lengths, train=False,
        interpret=interpret)
    return ysf, ysb


def _lstm_vjp_fwd_split(x, wif, wib, bif2, bib2, whf, whb, lengths,
                        interpret):
    ysf, ysb, csf, csb, resf, resb = _lstm_fwd_call_split(
        x, wif, wib, bif2, bib2, whf, whb, lengths, train=True,
        interpret=interpret)
    return (ysf, ysb), (x, wif, wib, whf, whb, lengths, ysf, ysb, csf, csb,
                        resf, resb)


def _lstm_vjp_bwd_split(interpret, resids, dy):
    (x, wif, wib, whf, whb, lengths, ysf, ysb, csf, csb, resf,
     resb) = resids
    dyf, dyb = dy
    # previous-state construction (full planes or in-kernel tiles per
    # INKERNEL_HP) lives in _lstm_bwd_call_split
    dxf, dxb, dwif, dwib, dbif, dbib, dwhf, dwhb = _lstm_bwd_call_split(
        x, resf, resb, ysf, ysb, csf, csb, dyf, dyb, wif, wib, whf, whb,
        lengths, interpret=interpret)
    dx = (dxf.astype(jnp.float32) + dxb.astype(jnp.float32)).astype(x.dtype)
    return (dx, dwif.astype(wif.dtype), dwib.astype(wib.dtype),
            dbif.reshape(-1), dbib.reshape(-1),
            dwhf.astype(whf.dtype), dwhb.astype(whb.dtype), None)


lstm_bidir_fused_split.defvjp(_lstm_vjp_fwd_split, _lstm_vjp_bwd_split)
