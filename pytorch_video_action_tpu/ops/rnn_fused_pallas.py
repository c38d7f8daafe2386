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
  from pre-scattered weight columns (``ops.rnn._pack_dir_cols`` layout:
  direction-f columns at gate-grouped positions, zeros elsewhere), so the
  gate-grouped xg tensor never exists in HBM.
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
            2 * chunk * b * gw2 * 4        # xg2 chunks f32 (fwd) / dxg2 (bwd)
            + b * w2 * 4 * 2               # h / dh carry
        )
        weights = (
            2 * w_in * gw2 * sz + w2 * gw2 * sz + 3 * gw2 * 4
            + 2 * w_in * gw2 * 4 + w2 * gw2 * 4  # bwd f32 accumulators
        )
        if max(streams_fwd, streams_bwd) + scratch + weights <= _VMEM_BUDGET:
            return chunk
    return None


def supported(t: int, b: int, h: int, w_in: int, dtype) -> bool:
    return (
        b % 8 == 0
        and h % 128 == 0
        and _pick_chunk(t, b, h, w_in, dtype) is not None
    )


# ----------------------------------------------------------------- forward


def _fwd_kernel(t_total, chunk, h, train,
                xf_ref, xr_ref, wif_ref, wib_ref, bi2_ref, wh2_ref, bh2_ref,
                len_ref, ysf_ref, ysb_ref, *rest):
    if train:
        res_ref, h_ref, xgf_ref, xgb_ref = rest
    else:
        h_ref, xgf_ref, xgb_ref = rest
        res_ref = None
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    b = xf_ref.shape[1]
    w_in = xf_ref.shape[2]
    gw2 = 6 * h

    # per-chunk input projections on the MXU (block-natural order; the
    # reversed view is consumed flipped in-block at step time)
    xf2d = xf_ref[:].reshape(chunk * b, w_in)
    xr2d = xr_ref[:].reshape(chunk * b, w_in)
    xgf_ref[:] = jnp.dot(
        xf2d, wif_ref[:], preferred_element_type=jnp.float32
    ).reshape(chunk, b, gw2)
    xgb_ref[:] = jnp.dot(
        xr2d, wib_ref[:], preferred_element_type=jnp.float32
    ).reshape(chunk, b, gw2)

    lengths = len_ref[:]  # [B, 1] int32

    def body(t, _):
        s = i * chunk + t  # kernel step
        # gate-grouped x gates: fwd cols from the fwd view at t, bwd cols
        # from the reversed view at CH-1-t (disjoint column support)
        g_x = xgf_ref[t] + xgb_ref[chunk - 1 - t] + bi2_ref[0]
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
            pl.BlockSpec((w_in, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, gw2), lambda i: (0, 0),
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
            pltpu.VMEM((chunk, b, gw2), jnp.float32),  # xg fwd chunk
            pltpu.VMEM((chunk, b, gw2), jnp.float32),  # xg bwd chunk
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

    # per-chunk projection backward on the MXU
    dxg2d = dxg_ref[:].reshape(chunk * b, gw2)
    xf2d = xf_ref[:].reshape(chunk * b, w_in)
    xr2d = xr_ref[:].reshape(chunk * b, w_in)
    dxg_cast = dxg2d.astype(wif_ref.dtype)
    dxf_ref[:] = jnp.dot(
        dxg_cast, wif_ref[:].T, preferred_element_type=jnp.float32
    ).reshape(chunk, b, w_in).astype(dxf_ref.dtype)
    # the reversed view pairs x_rev row u with kernel step CH-1-u
    # (static slice-concat: Mosaic has no `rev` lowering)
    dxg_flip = jnp.concatenate(
        [dxg_ref[chunk - 1 - u] for u in range(chunk)], axis=0)
    dxg_flip_cast = dxg_flip.astype(wib_ref.dtype)
    dxb_ref[:] = jnp.dot(
        dxg_flip_cast, wib_ref[:].T, preferred_element_type=jnp.float32
    ).reshape(chunk, b, w_in).astype(dxb_ref.dtype)
    dwif_ref[:] += jnp.dot(
        xf2d.T, dxg2d.astype(xf2d.dtype), preferred_element_type=jnp.float32)
    dwib_ref[:] += jnp.dot(
        xr2d.T, dxg_flip.astype(xr2d.dtype),
        preferred_element_type=jnp.float32)
    dbi2_ref[:] += jnp.sum(dxg2d, axis=0, keepdims=True)


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
            pl.BlockSpec((w_in, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * h, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b, w_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * h, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, w_in), x.dtype),   # dxf
            jax.ShapeDtypeStruct((t, b, w_in), x.dtype),   # dxb (orig order)
            jax.ShapeDtypeStruct((w_in, gw2), jnp.float32),
            jax.ShapeDtypeStruct((w_in, gw2), jnp.float32),
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

    Weights are in the pre-scattered/packed layouts of ``ops.rnn``:
    ``wif2/wib2 [W_in, 6H]`` (``_pack_dir_cols``), ``wh2 [2H, 6H]``
    (``_pack_gate_grouped``), ``bi2/bh2 [6H]`` (``_pack_gate_grouped_vec``).
    Returns ``(ys_f [T, B, H], ys_b [T, B, H])`` BOTH in original time
    order, unmasked (caller masks).  ``lengths [B]`` drives the backward
    chain's carry freeze.
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
        scratch = (
            2 * chunk * b * gw2 * 4
            + b * w2 * 4 * 4                # h, c / dh, dc carries
        )
        weights = (
            2 * w_in * gw2 * sz + w2 * gw2 * sz + gw2 * 4
            + 2 * w_in * gw2 * 4 + w2 * gw2 * 4
        )
        if max(streams_fwd, streams_bwd) + scratch + weights <= _VMEM_BUDGET:
            return chunk
    return None


def lstm_supported(t: int, b: int, h: int, w_in: int, dtype) -> bool:
    return (
        b % 8 == 0
        and h % 128 == 0
        and _pick_chunk_lstm(t, b, h, w_in, dtype) is not None
    )


def _lstm_fwd_kernel(t_total, chunk, h, train,
                     xf_ref, xr_ref, wif_ref, wib_ref, bi2_ref, wh2_ref,
                     len_ref, ysf_ref, ysb_ref, cs_ref, *rest):
    if train:
        res_ref, h_ref, c_ref, xgf_ref, xgb_ref = rest
    else:
        h_ref, c_ref, xgf_ref, xgb_ref = rest
        res_ref = None
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    b = xf_ref.shape[1]
    w_in = xf_ref.shape[2]
    gw2 = 8 * h
    w2 = 2 * h

    xf2d = xf_ref[:].reshape(chunk * b, w_in)
    xr2d = xr_ref[:].reshape(chunk * b, w_in)
    xgf_ref[:] = jnp.dot(
        xf2d, wif_ref[:], preferred_element_type=jnp.float32
    ).reshape(chunk, b, gw2)
    xgb_ref[:] = jnp.dot(
        xr2d, wib_ref[:], preferred_element_type=jnp.float32
    ).reshape(chunk, b, gw2)

    lengths = len_ref[:]  # [B, 1]

    def body(t, _):
        s = i * chunk + t
        g_x = xgf_ref[t] + xgb_ref[chunk - 1 - t] + bi2_ref[0]
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
        pltpu.VMEM((chunk, b, gw2), jnp.float32),
        pltpu.VMEM((chunk, b, gw2), jnp.float32),
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
            pl.BlockSpec((w_in, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, gw2), lambda i: (0, 0),
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

    dxg2d = dxg_ref[:].reshape(chunk * b, gw2)
    xf2d = xf_ref[:].reshape(chunk * b, w_in)
    xr2d = xr_ref[:].reshape(chunk * b, w_in)
    dxf_ref[:] = jnp.dot(
        dxg2d.astype(wif_ref.dtype), wif_ref[:].T,
        preferred_element_type=jnp.float32
    ).reshape(chunk, b, w_in).astype(dxf_ref.dtype)
    dxg_flip = jnp.concatenate(
        [dxg_ref[chunk - 1 - u] for u in range(chunk)], axis=0)
    dxb_ref[:] = jnp.dot(
        dxg_flip.astype(wib_ref.dtype), wib_ref[:].T,
        preferred_element_type=jnp.float32
    ).reshape(chunk, b, w_in).astype(dxb_ref.dtype)
    dwif_ref[:] += jnp.dot(
        xf2d.T, dxg2d.astype(xf2d.dtype), preferred_element_type=jnp.float32)
    dwib_ref[:] += jnp.dot(
        xr2d.T, dxg_flip.astype(xr2d.dtype),
        preferred_element_type=jnp.float32)
    dbi2_ref[:] += jnp.sum(dxg2d, axis=0, keepdims=True)


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
            pl.BlockSpec((w_in, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * h, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b, w_in), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w_in), fwdm, memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * h, gw2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, w_in), x.dtype),
            jax.ShapeDtypeStruct((t, b, w_in), x.dtype),
            jax.ShapeDtypeStruct((w_in, gw2), jnp.float32),
            jax.ShapeDtypeStruct((w_in, gw2), jnp.float32),
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

    Same contract as :func:`gru_bidir_fused` with the LSTM packing: both
    biases pre-folded into ``bi2`` (``torch.nn.LSTM`` adds bi+bh to every
    gate), no separate hidden bias.  Returns ``(ys_f, ys_b)`` in original
    time order, unmasked.
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
