"""Pallas TPU kernels: fused GRU sequence scan (forward + custom VJP).

The XLA ``lax.scan`` recurrence is latency-bound: every time step dispatches
a small hidden matmul from HBM-resident buffers.  This kernel runs the whole
scan inside one ``pallas_call``: the packed hidden weights ``[W, 3W]`` stay
pinned in VMEM, the carry lives in a VMEM scratch register, and the input
gates stream through double-buffered chunks — per-step cost drops to the MXU
issue latency.

Masking note: validity masks are *prefix-form* (all valid frames precede all
padding), so carry-freeze inside the scan is unnecessary — invalid steps can
only corrupt the carry *after* every valid output was produced.  The kernels
therefore run the raw recurrence and the caller masks the outputs, which is
numerically identical on valid frames (tested against the XLA path).

Backward strategy: recompute.  Only the forward outputs ``ys`` are saved
(shifted by one step they are exactly ``h_prev``); the backward kernel
re-derives the gates from ``xg`` and ``h_prev`` (one extra matmul per step)
instead of storing ``[T, B, 3W]`` residuals — 4x less HBM traffic, which is
the actual constraint.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 11 * 1024 * 1024  # leave headroom under the 16MB/core limit


def _pick_chunk(t: int, b: int, w: int, gw: int, streams: int = 16) -> int | None:
    """Largest chunk length whose double-buffered in/out blocks + weights fit
    in VMEM.  ``streams`` = total streamed width in units of W per time step
    x 2 for double buffering (GRU bwd: 16, LSTM bwd: 24 — the bwd pass is
    always the wider one)."""
    for chunk in (64, 32, 16, 8):
        if t % chunk:
            continue
        blocks = streams * w * chunk * b * 4
        fixed = w * gw * 4 * 2 + 2 * b * w * 4
        if blocks + fixed <= _VMEM_BUDGET:
            return chunk
    return None


def _supported(t: int, b: int, w: int, gw: int) -> bool:
    # gate on the WIDEST kernel in the active VJP path — gating on the
    # forward's width would admit shapes whose backward then fails to fit
    # VMEM and crashes under jax.grad (saved-gates bwd streams 18;
    # recompute bwd streams 16)
    bwd_streams = 16 if _RECOMPUTE_BWD else 18
    return (
        b % 8 == 0
        and w % 128 == 0
        and gw == 3 * w
        and _pick_chunk(t, b, w, gw, streams=bwd_streams) is not None
    )


# PVA_RNN_BF16_GATES=1 evaluates the gate transcendentals in bfloat16
# (pre-activations cast down, sigmoid/tanh in bf16, result cast back up).
# The carry/cell mix and every matmul accumulator stay f32 — only the
# nonlinearity inputs/outputs lose mantissa.  Opt-in: the accuracy cost is
# per-gate ~3e-3 absolute; measured throughput is recorded in
# docs/PERF_NOTES.md and decides the default.
_BF16_GATES = _os.environ.get("PVA_RNN_BF16_GATES") == "1"


def _sigmoid(x):
    if _BF16_GATES:
        # spelled out: Mosaic rejects jax.nn.sigmoid's lowering on bf16
        # vectors (f32 scalar broadcast into a bf16 vector); exp is fine
        xb = x.astype(jnp.bfloat16)
        return (1.0 / (1.0 + jnp.exp(-xb))).astype(jnp.float32)
    return jax.nn.sigmoid(x)


def _tanh(x):
    if _BF16_GATES:
        return jnp.tanh(x.astype(jnp.bfloat16)).astype(jnp.float32)
    return jnp.tanh(x)


# ------------------------------------------------------------------ forward


def _gru_fwd_kernel(xg_ref, wh_ref, bh_ref, ys_ref, h_ref):
    w = wh_ref.shape[0]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    def body(t, _):
        g_x = xg_ref[t]
        h = h_ref[:]
        hg = jnp.dot(
            h.astype(wh_ref.dtype), wh_ref[:],
            preferred_element_type=jnp.float32,
        ) + bh_ref[0]
        r = _sigmoid(g_x[:, :w] + hg[:, :w])
        z = _sigmoid(g_x[:, w : 2 * w] + hg[:, w : 2 * w])
        n = _tanh(g_x[:, 2 * w :] + r * hg[:, 2 * w :])
        hn = (1.0 - z) * n + z * h
        h_ref[:] = hn
        ys_ref[t] = hn.astype(ys_ref.dtype)
        return 0

    jax.lax.fori_loop(0, xg_ref.shape[0], body, 0, unroll=True)


def _gru_fwd(xg, wh, bh, *, interpret):
    t, b, gw = xg.shape
    w = wh.shape[0]
    chunk = _pick_chunk(t, b, w, gw, streams=8)  # in 3W + out W, 2x buffered
    return pl.pallas_call(
        _gru_fwd_kernel,
        grid=(t // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, b, gw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (chunk, b, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, b, w), xg.dtype),
        scratch_shapes=[pltpu.VMEM((b, w), jnp.float32)],
        interpret=interpret,
    )(xg, wh, bh.reshape(1, gw))


# ------------------------------------------------- forward with saved gates
# Training variant: also emits the per-step gate values (r, z, n) and the
# hidden n-gate pre-mix hg_n, so the backward pass needs NO transcendental
# recompute — the backward's cost was dominated by re-running
# sigmoid/sigmoid/tanh over the whole gate volume (docs/PERF_NOTES.md), and
# the saved residuals are cheap HBM traffic by comparison (~4W per step).


def _gru_fwd_save_kernel(xg_ref, wh_ref, bh_ref, ys_ref, res_ref, h_ref):
    w = wh_ref.shape[0]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    def body(t, _):
        g_x = xg_ref[t]
        h = h_ref[:]
        hg = jnp.dot(
            h.astype(wh_ref.dtype), wh_ref[:],
            preferred_element_type=jnp.float32,
        ) + bh_ref[0]
        r = _sigmoid(g_x[:, :w] + hg[:, :w])
        z = _sigmoid(g_x[:, w : 2 * w] + hg[:, w : 2 * w])
        hg_n = hg[:, 2 * w :]
        n = _tanh(g_x[:, 2 * w :] + r * hg_n)
        hn = (1.0 - z) * n + z * h
        h_ref[:] = hn
        ys_ref[t] = hn.astype(ys_ref.dtype)
        res_ref[t] = jnp.concatenate([r, z, n, hg_n], axis=-1).astype(
            res_ref.dtype
        )
        return 0

    jax.lax.fori_loop(0, xg_ref.shape[0], body, 0, unroll=True)


def _gru_fwd_save(xg, wh, bh, *, interpret):
    t, b, gw = xg.shape
    w = wh.shape[0]
    chunk = _pick_chunk(t, b, w, gw, streams=16)  # in 3W + out (W + 4W)
    return pl.pallas_call(
        _gru_fwd_save_kernel,
        grid=(t // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, b, gw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, 4 * w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, w), xg.dtype),
            jax.ShapeDtypeStruct((t, b, 4 * w), xg.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((b, w), jnp.float32)],
        interpret=interpret,
    )(xg, wh, bh.reshape(1, gw))


def _gru_bwd_saved_kernel(
    res_ref, hp_ref, dy_ref, wh_ref,
    dxg_ref, dwh_ref, dbh_ref, dh_ref,
):
    """Backward from saved gates: pure polynomial elementwise + two MXU dots
    per step — no sigmoid/tanh recompute."""
    w = wh_ref.shape[0]
    i = pl.program_id(0)
    t_chunk = res_ref.shape[0]

    @pl.when(i == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbh_ref[:] = jnp.zeros_like(dbh_ref)

    def body(j, _):
        t = t_chunk - 1 - j
        res = res_ref[t]
        r = res[:, :w]
        z = res[:, w : 2 * w]
        n = res[:, 2 * w : 3 * w]
        hg_n = res[:, 3 * w :]
        hp = hp_ref[t]
        dh = dy_ref[t] + dh_ref[:]
        dz = dh * (hp - n)
        dpre_n = dh * (1.0 - z) * (1.0 - n * n)
        dpre_r = dpre_n * hg_n * r * (1.0 - r)
        dpre_z = dz * z * (1.0 - z)
        dxg_ref[t] = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1).astype(
            dxg_ref.dtype
        )
        dhg = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=-1)
        dhg_c = dhg.astype(wh_ref.dtype)
        dh_ref[:] = dh * z + jnp.dot(
            dhg_c, wh_ref[:].T, preferred_element_type=jnp.float32
        )
        dwh_ref[:] += jnp.dot(
            hp.T.astype(wh_ref.dtype), dhg_c, preferred_element_type=jnp.float32
        )
        dbh_ref[:] += jnp.sum(dhg, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, t_chunk, body, 0, unroll=True)


def _gru_bwd_saved_call(res, hp, dy, wh, *, interpret):
    t, b, rw = res.shape
    w = wh.shape[0]
    gw = 3 * w
    chunk = _pick_chunk(t, b, w, gw, streams=18)  # in 4W+W+W, out 3W
    nc = t // chunk
    rev = lambda i: (nc - 1 - i, 0, 0)  # noqa: E731
    return pl.pallas_call(
        _gru_bwd_saved_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk, b, 4 * w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b, gw), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, gw), res.dtype),
            jax.ShapeDtypeStruct((w, gw), jnp.float32),
            jax.ShapeDtypeStruct((1, gw), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, w), jnp.float32)],
        interpret=interpret,
    )(res, hp, dy, wh)


# ----------------------------------------------------------------- backward


def _gru_bwd_kernel(
    xg_ref, hp_ref, dy_ref, wh_ref, bh_ref,
    dxg_ref, dwh_ref, dbh_ref, dh_ref,
):
    w = wh_ref.shape[0]
    i = pl.program_id(0)
    t_chunk = xg_ref.shape[0]

    @pl.when(i == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbh_ref[:] = jnp.zeros_like(dbh_ref)

    def body(j, _):
        t = t_chunk - 1 - j
        g_x = xg_ref[t]
        hp = hp_ref[t]
        dy = dy_ref[t]
        # recompute forward gates for this step
        hg = jnp.dot(hp, wh_ref[:], preferred_element_type=jnp.float32) + bh_ref[0]
        r = _sigmoid(g_x[:, :w] + hg[:, :w])
        z = _sigmoid(g_x[:, w : 2 * w] + hg[:, w : 2 * w])
        n = _tanh(g_x[:, 2 * w :] + r * hg[:, 2 * w :])
        # dL/dh_t = upstream dy_t + carry from step t+1
        dh = dy + dh_ref[:]
        dz = dh * (hp - n)
        dn = dh * (1.0 - z)
        dpre_n = dn * (1.0 - n * n)
        dr = dpre_n * hg[:, 2 * w :]
        dpre_r = dr * r * (1.0 - r)
        dpre_z = dz * z * (1.0 - z)
        # x side sees xn directly (grad dpre_n); hidden side sees r * hg_n
        # (grad dpre_n * r) — r/z blocks are shared between both sides
        dxg_ref[t] = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1).astype(
            dxg_ref.dtype
        )
        dhg = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=-1)
        dhg_c = dhg.astype(wh_ref.dtype)
        dh_ref[:] = dh * z + jnp.dot(
            dhg_c, wh_ref[:].T, preferred_element_type=jnp.float32
        )
        dwh_ref[:] += jnp.dot(hp.T, dhg_c, preferred_element_type=jnp.float32)
        dbh_ref[:] += jnp.sum(dhg, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, t_chunk, body, 0, unroll=True)


def _gru_bwd_call(xg, hp, dy, wh, bh, *, interpret):
    t, b, gw = xg.shape
    w = wh.shape[0]
    chunk = _pick_chunk(t, b, w, gw)
    nc = t // chunk
    rev = lambda i: (nc - 1 - i, 0, 0)  # noqa: E731 — walk chunks last->first
    return pl.pallas_call(
        _gru_bwd_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk, b, gw), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b, gw), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, gw), xg.dtype),
            jax.ShapeDtypeStruct((w, gw), jnp.float32),
            jax.ShapeDtypeStruct((1, gw), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, w), jnp.float32)],
        interpret=interpret,
    )(xg, hp, dy, wh, bh.reshape(1, gw))


# ---------------------------------------------------------------- custom vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gru_scan_pallas(xg, wh, bh, interpret=False):
    """Raw (unmasked) GRU recurrence over time-major ``xg [T, B, 3W]``.
    Returns ``ys [T, B, W]``; caller applies the validity mask."""
    return _gru_fwd(xg, wh, bh, interpret=interpret)


# PVA_RNN_RECOMPUTE=1 restores the recompute backward (no saved gates) —
# trades ~4x less residual HBM for re-running the gate transcendentals,
# which measurement showed dominate the backward (docs/PERF_NOTES.md)
_RECOMPUTE_BWD = _os.environ.get("PVA_RNN_RECOMPUTE") == "1"


def _vjp_fwd(xg, wh, bh, interpret):
    if _RECOMPUTE_BWD:
        ys = _gru_fwd(xg, wh, bh, interpret=interpret)
        return ys, (xg, wh, bh, ys, None)
    ys, gates = _gru_fwd_save(xg, wh, bh, interpret=interpret)
    return ys, (None, wh, bh, ys, gates)


def _vjp_bwd(interpret, res, dy):
    xg, wh, bh, ys, gates = res
    # h_prev sequence: ys shifted one step (h_{-1} = 0)
    hp = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    if gates is None:
        dxg, dwh, dbh = _gru_bwd_call(xg, hp, dy, wh, bh, interpret=interpret)
    else:
        dxg, dwh, dbh = _gru_bwd_saved_call(
            gates, hp, dy, wh, interpret=interpret
        )
    return dxg, dwh.astype(wh.dtype), dbh.reshape(-1).astype(bh.dtype)


gru_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def gru_scan(xg_tm, wh, bh, mask_tm):
    """Drop-in for the packed XLA GRU scan: masked ``ys [T, B, W]``.
    Falls back to None when shapes are unsupported (caller uses XLA)."""
    t, b, gw = xg_tm.shape
    w = wh.shape[0]
    if not _supported(t, b, w, gw):
        return None
    interpret = jax.default_backend() != "tpu"
    ys = gru_scan_pallas(xg_tm, wh, bh, interpret)
    return ys * mask_tm


# ======================================================================= LSTM
# Simpler than GRU: both biases fold into the input projection (so the kernel
# takes no bias operand and dbias flows through dxg automatically), and the
# gate gradients are identical on the x and hidden sides.  The cell state c
# is a second output (needed as the backward residual alongside h).


def _lstm_fwd_kernel(xg_ref, wh_ref, ys_ref, cs_ref, h_ref, c_ref):
    w = wh_ref.shape[0]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    def body(t, _):
        g_x = xg_ref[t]
        h = h_ref[:]
        gates = g_x + jnp.dot(
            h.astype(wh_ref.dtype), wh_ref[:],
            preferred_element_type=jnp.float32,
        )
        ii = _sigmoid(gates[:, :w])
        f = _sigmoid(gates[:, w : 2 * w])
        g = _tanh(gates[:, 2 * w : 3 * w])
        o = _sigmoid(gates[:, 3 * w :])
        c = f * c_ref[:] + ii * g
        hn = o * _tanh(c)
        h_ref[:] = hn
        c_ref[:] = c
        ys_ref[t] = hn.astype(ys_ref.dtype)
        cs_ref[t] = c.astype(cs_ref.dtype)
        return 0

    jax.lax.fori_loop(0, xg_ref.shape[0], body, 0, unroll=True)


def _lstm_fwd(xg, wh, *, interpret):
    t, b, gw = xg.shape
    w = wh.shape[0]
    chunk = _pick_chunk(t, b, w, gw, streams=12)  # in 4W + out 2W, 2x buffered
    return pl.pallas_call(
        _lstm_fwd_kernel,
        grid=(t // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, b, gw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, w), xg.dtype),
            jax.ShapeDtypeStruct((t, b, w), xg.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, w), jnp.float32),
            pltpu.VMEM((b, w), jnp.float32),
        ],
        interpret=interpret,
    )(xg, wh)


def _lstm_fwd_save_kernel(xg_ref, wh_ref, ys_ref, cs_ref, res_ref, h_ref, c_ref):
    """Training forward: also emits (ii, f, g, o, tanh_c) so the backward
    needs no gate/tanh recompute (same strategy as the GRU saved-gates
    kernel above)."""
    w = wh_ref.shape[0]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    def body(t, _):
        g_x = xg_ref[t]
        h = h_ref[:]
        gates = g_x + jnp.dot(
            h.astype(wh_ref.dtype), wh_ref[:],
            preferred_element_type=jnp.float32,
        )
        ii = _sigmoid(gates[:, :w])
        f = _sigmoid(gates[:, w : 2 * w])
        g = _tanh(gates[:, 2 * w : 3 * w])
        o = _sigmoid(gates[:, 3 * w :])
        c = f * c_ref[:] + ii * g
        tanh_c = _tanh(c)
        hn = o * tanh_c
        h_ref[:] = hn
        c_ref[:] = c
        ys_ref[t] = hn.astype(ys_ref.dtype)
        cs_ref[t] = c.astype(cs_ref.dtype)
        res_ref[t] = jnp.concatenate([ii, f, g, o, tanh_c], axis=-1).astype(
            res_ref.dtype
        )
        return 0

    jax.lax.fori_loop(0, xg_ref.shape[0], body, 0, unroll=True)


def _lstm_fwd_save(xg, wh, *, interpret):
    t, b, gw = xg.shape
    w = wh.shape[0]
    chunk = _pick_chunk(t, b, w, gw, streams=22)  # in 4W + out W+W+5W
    return pl.pallas_call(
        _lstm_fwd_save_kernel,
        grid=(t // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, b, gw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, 5 * w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, w), xg.dtype),
            jax.ShapeDtypeStruct((t, b, w), xg.dtype),
            jax.ShapeDtypeStruct((t, b, 5 * w), xg.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, w), jnp.float32),
            pltpu.VMEM((b, w), jnp.float32),
        ],
        interpret=interpret,
    )(xg, wh)


def _lstm_bwd_saved_kernel(
    res_ref, hp_ref, cp_ref, dy_ref, wh_ref,
    dxg_ref, dwh_ref, dh_ref, dc_ref,
):
    w = wh_ref.shape[0]
    i = pl.program_id(0)
    t_chunk = res_ref.shape[0]

    @pl.when(i == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    def body(j, _):
        t = t_chunk - 1 - j
        res = res_ref[t]
        ii = res[:, :w]
        f = res[:, w : 2 * w]
        g = res[:, 2 * w : 3 * w]
        o = res[:, 3 * w : 4 * w]
        tanh_c = res[:, 4 * w :]
        cp = cp_ref[t]
        hp = hp_ref[t]

        dh = dy_ref[t] + dh_ref[:]
        do = dh * tanh_c
        dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_ref[:]
        dpre_i = dc * g * ii * (1.0 - ii)
        dpre_f = dc * cp * f * (1.0 - f)
        dpre_g = dc * ii * (1.0 - g * g)
        dpre_o = do * o * (1.0 - o)
        dgates = jnp.concatenate([dpre_i, dpre_f, dpre_g, dpre_o], axis=-1)
        dgates_c = dgates.astype(wh_ref.dtype)
        dxg_ref[t] = dgates.astype(dxg_ref.dtype)
        dh_ref[:] = jnp.dot(
            dgates_c, wh_ref[:].T, preferred_element_type=jnp.float32
        )
        dc_ref[:] = dc * f
        dwh_ref[:] += jnp.dot(
            hp.T.astype(wh_ref.dtype), dgates_c,
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, t_chunk, body, 0, unroll=True)


def _lstm_bwd_saved_call(res, hp, cp, dy, wh, *, interpret):
    t, b, rw = res.shape
    w = wh.shape[0]
    gw = 4 * w
    chunk = _pick_chunk(t, b, w, gw, streams=24)  # in 5W+W+W+W, out 4W
    nc = t // chunk
    rev = lambda i: (nc - 1 - i, 0, 0)  # noqa: E731
    return pl.pallas_call(
        _lstm_bwd_saved_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk, b, 5 * w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b, gw), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, gw), res.dtype),
            jax.ShapeDtypeStruct((w, gw), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, w), jnp.float32),
            pltpu.VMEM((b, w), jnp.float32),
        ],
        interpret=interpret,
    )(res, hp, cp, dy, wh)


def _lstm_bwd_kernel(
    xg_ref, hp_ref, cp_ref, cs_ref, dy_ref, wh_ref,
    dxg_ref, dwh_ref, dh_ref, dc_ref,
):
    w = wh_ref.shape[0]
    i = pl.program_id(0)
    t_chunk = xg_ref.shape[0]

    @pl.when(i == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    def body(j, _):
        t = t_chunk - 1 - j
        g_x = xg_ref[t]
        hp = hp_ref[t]
        cp = cp_ref[t]
        c = cs_ref[t]
        gates = g_x + jnp.dot(hp, wh_ref[:], preferred_element_type=jnp.float32)
        ii = _sigmoid(gates[:, :w])
        f = _sigmoid(gates[:, w : 2 * w])
        g = _tanh(gates[:, 2 * w : 3 * w])
        o = _sigmoid(gates[:, 3 * w :])
        tanh_c = _tanh(c)

        dh = dy_ref[t] + dh_ref[:]
        do = dh * tanh_c
        dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_ref[:]
        dpre_i = dc * g * ii * (1.0 - ii)
        dpre_f = dc * cp * f * (1.0 - f)
        dpre_g = dc * ii * (1.0 - g * g)
        dpre_o = do * o * (1.0 - o)
        dgates = jnp.concatenate([dpre_i, dpre_f, dpre_g, dpre_o], axis=-1)
        dgates_c = dgates.astype(wh_ref.dtype)
        dxg_ref[t] = dgates.astype(dxg_ref.dtype)
        dh_ref[:] = jnp.dot(
            dgates_c, wh_ref[:].T, preferred_element_type=jnp.float32
        )
        dc_ref[:] = dc * f
        dwh_ref[:] += jnp.dot(hp.T, dgates_c, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, t_chunk, body, 0, unroll=True)


def _lstm_bwd_call(xg, hp, cp, cs, dy, wh, *, interpret):
    t, b, gw = xg.shape
    w = wh.shape[0]
    chunk = _pick_chunk(t, b, w, gw, streams=24)
    nc = t // chunk
    rev = lambda i: (nc - 1 - i, 0, 0)  # noqa: E731
    return pl.pallas_call(
        _lstm_bwd_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk, b, gw), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, w), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, b, gw), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, gw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, gw), xg.dtype),
            jax.ShapeDtypeStruct((w, gw), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, w), jnp.float32),
            pltpu.VMEM((b, w), jnp.float32),
        ],
        interpret=interpret,
    )(xg, hp, cp, cs, dy, wh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_scan_pallas(xg, wh, interpret=False):
    """Raw (unmasked) LSTM recurrence over time-major ``xg [T, B, 4W]``
    (biases pre-folded into xg).  Returns ``ys [T, B, W]``."""
    ys, _ = _lstm_fwd(xg, wh, interpret=interpret)
    return ys


def _lstm_vjp_fwd(xg, wh, interpret):
    if _RECOMPUTE_BWD:
        ys, cs = _lstm_fwd(xg, wh, interpret=interpret)
        return ys, (xg, wh, ys, cs, None)
    ys, cs, gates = _lstm_fwd_save(xg, wh, interpret=interpret)
    return ys, (None, wh, ys, cs, gates)


def _lstm_vjp_bwd(interpret, res, dy):
    xg, wh, ys, cs, gates = res
    hp = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    cp = jnp.concatenate([jnp.zeros_like(cs[:1]), cs[:-1]], axis=0)
    if gates is None:
        dxg, dwh = _lstm_bwd_call(xg, hp, cp, cs, dy, wh, interpret=interpret)
    else:
        dxg, dwh = _lstm_bwd_saved_call(gates, hp, cp, dy, wh,
                                        interpret=interpret)
    return dxg, dwh.astype(wh.dtype)


lstm_scan_pallas.defvjp(_lstm_vjp_fwd, _lstm_vjp_bwd)


def lstm_scan(xg_tm, wh, mask_tm):
    """Drop-in for the packed XLA LSTM scan: masked ``ys [T, B, W]``."""
    t, b, gw = xg_tm.shape
    w = wh.shape[0]
    if not (b % 8 == 0 and w % 128 == 0 and gw == 4 * w
            and _pick_chunk(t, b, w, gw, streams=24) is not None):
        return None
    interpret = jax.default_backend() != "tpu"
    ys = lstm_scan_pallas(xg_tm, wh, interpret)
    return ys * mask_tm
