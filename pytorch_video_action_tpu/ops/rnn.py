"""LSTM/GRU sequence cores, TPU-first.

Design (SURVEY.md §3.5): instead of translating cuDNN's fused per-step RNN,
we split each layer into

1. **input projection** — one large ``[B*T, D] @ [D, gH]`` matmul over the
   whole sequence.  This is where nearly all FLOPs live (D=400 vs H<=256) and
   it tiles perfectly onto the MXU.
2. **recurrence** — a ``jax.lax.scan`` over time whose body does only the
   small ``[B, H] @ [H, gH]`` hidden matmul + element-wise gates (VPU).  An
   optional Pallas kernel (ops/rnn_pallas.py) fuses the whole scan with the
   weights pinned in VMEM.

Gate layouts and initialization match ``torch.nn.LSTM`` / ``torch.nn.GRU``
(gates ``i,f,g,o`` and ``r,z,n``; all params ``U(-1/sqrt(H), 1/sqrt(H))``) so
numerical parity against the reference models is testable weight-for-weight.
Padded steps freeze the carry and emit zeros, reproducing
``pack_padded_sequence``/``pad_packed_sequence`` masking (``networks.py:40-43``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .masking import length_mask, masked_reverse


def _uniform(rng, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def init_rnn_layer(rng, input_dim: int, hidden_dim: int, n_gates: int) -> dict:
    """One direction of one layer. Layout: wi [D, g*H], wh [H, g*H] (transposed
    vs torch for right-multiplication), biases [g*H]."""
    k = 1.0 / jnp.sqrt(hidden_dim)
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    g = n_gates
    return {
        "wi": _uniform(r1, (input_dim, g * hidden_dim), k),
        "wh": _uniform(r2, (hidden_dim, g * hidden_dim), k),
        "bi": _uniform(r3, (g * hidden_dim,), k),
        "bh": _uniform(r4, (g * hidden_dim,), k),
    }


def init_rnn(
    rng,
    input_dim: int,
    hidden_dim: int,
    num_layers: int,
    *,
    bidirectional: bool,
    n_gates: int,
) -> list[dict]:
    """Params: list over layers of {'fwd': dir_params, ['bwd': dir_params]}."""
    layers = []
    d = input_dim
    out_mult = 2 if bidirectional else 1
    for _ in range(num_layers):
        rng, rf, rb = jax.random.split(rng, 3)
        layer = {"fwd": init_rnn_layer(rf, d, hidden_dim, n_gates)}
        if bidirectional:
            layer["bwd"] = init_rnn_layer(rb, d, hidden_dim, n_gates)
        layers.append(layer)
        d = hidden_dim * out_mult
    return layers


def _lstm_scan(xg: jax.Array, wh: jax.Array, mask: jax.Array, hidden_dim: int):
    """xg: [T, B, 4H] precomputed input gates (+ biases); mask: [T, B, 1]."""
    h = hidden_dim
    b = xg.shape[1]
    h0 = jnp.zeros((b, h), xg.dtype)
    c0 = jnp.zeros((b, h), xg.dtype)

    def step(carry, inp):
        hp, cp = carry
        g_x, m = inp
        gates = g_x + hp @ wh
        i = jax.nn.sigmoid(gates[:, :h])
        f = jax.nn.sigmoid(gates[:, h : 2 * h])
        g = jnp.tanh(gates[:, 2 * h : 3 * h])
        o = jax.nn.sigmoid(gates[:, 3 * h :])
        c = f * cp + i * g
        hn = o * jnp.tanh(c)
        # carry-freeze on padded steps (pack_padded semantics)
        hn = jnp.where(m, hn, hp)
        c = jnp.where(m, c, cp)
        return (hn, c), hn * m

    (_, _), ys = jax.lax.scan(step, (h0, c0), (xg, mask), unroll=8)
    return ys  # [T, B, H], zeros at padded steps


def _gru_scan(xg: jax.Array, wh: jax.Array, bh: jax.Array, mask: jax.Array, hidden_dim: int):
    """torch GRU: r,z from summed projections; candidate n applies the reset
    gate to the *hidden* projection including its bias:
    ``n = tanh(x_n + r * (W_hn h + b_hn))``."""
    h = hidden_dim
    b = xg.shape[1]
    h0 = jnp.zeros((b, h), xg.dtype)

    def step(hp, inp):
        g_x, m = inp
        hg = hp @ wh + bh
        r = jax.nn.sigmoid(g_x[:, :h] + hg[:, :h])
        z = jax.nn.sigmoid(g_x[:, h : 2 * h] + hg[:, h : 2 * h])
        n = jnp.tanh(g_x[:, 2 * h :] + r * hg[:, 2 * h :])
        hn = (1.0 - z) * n + z * hp
        hn = jnp.where(m, hn, hp)
        return hn, hn * m

    _, ys = jax.lax.scan(step, h0, (xg, mask), unroll=8)
    return ys


def _run_direction(
    cell: str,
    p: dict,
    x: jax.Array,
    lengths: jax.Array,
    mask_bt: jax.Array,
    hidden_dim: int,
    reverse: bool,
):
    if reverse:
        x = masked_reverse(x, lengths)
    b, t, _ = x.shape
    if cell == "lstm":
        xg = x @ p["wi"] + p["bi"] + p["bh"]  # fold both biases into gates
    else:  # gru: hidden bias must stay inside the reset gate
        xg = x @ p["wi"] + p["bi"]
    xg = jnp.swapaxes(xg, 0, 1)  # time-major [T, B, gH]
    m = jnp.swapaxes(mask_bt.astype(x.dtype)[:, :, None], 0, 1)
    if cell == "lstm":
        ys = _lstm_scan(xg, p["wh"], m, hidden_dim)
    else:
        ys = _gru_scan(xg, p["wh"], p["bh"], m, hidden_dim)
    ys = jnp.swapaxes(ys, 0, 1)  # [B, T, H]
    if reverse:
        ys = masked_reverse(ys, lengths)
    return ys


def rnn_apply(
    cell: str,
    layers: list[dict],
    x: jax.Array,
    lengths: jax.Array,
    hidden_dim: int,
    *,
    bidirectional: bool,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng=None,
    scan_impl=None,
) -> jax.Array:
    """Multi-layer (bi)directional RNN over ``x [B,T,D]`` -> ``[B,T,H*dirs]``.

    Inter-layer dropout on every layer's output except the last, matching
    ``torch.nn.LSTM(dropout=...)`` placement (no-op when num_layers == 1).
    ``scan_impl`` optionally overrides the per-direction scan (Pallas path).
    """
    assert cell in ("lstm", "gru")
    t = x.shape[1]
    mask_bt = length_mask(lengths, t)
    run = scan_impl or _run_direction
    out = x
    for li, layer in enumerate(layers):
        fwd = run(cell, layer["fwd"], out, lengths, mask_bt, hidden_dim, False)
        if bidirectional:
            bwd = run(cell, layer["bwd"], out, lengths, mask_bt, hidden_dim, True)
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
        if train and dropout_rate > 0.0 and li < len(layers) - 1 and rng is not None:
            rng, sub = jax.random.split(rng)
            keep = 1.0 - dropout_rate
            out = out * jax.random.bernoulli(sub, keep, out.shape) / keep
    return out


lstm_apply = partial(rnn_apply, "lstm")
gru_apply = partial(rnn_apply, "gru")
