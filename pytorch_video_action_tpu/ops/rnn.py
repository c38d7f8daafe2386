"""LSTM/GRU sequence cores, TPU-first.

Design (SURVEY.md §3.5): instead of translating cuDNN's fused per-step RNN,
we split each layer into

1. **input projection** — one large ``[B*T, D] @ [D, gH]`` matmul over the
   whole sequence.  This is where nearly all FLOPs live (D=400 vs H<=256) and
   it tiles perfectly onto the MXU.
2. **recurrence** — a ``jax.lax.scan`` over time whose body does only the
   small hidden matmul + element-wise gates.  The recurrence is
   latency-bound, not FLOP-bound, so both directions of a bidirectional
   layer run in the *same* scan body: their hidden matmuls are packed into
   one block-diagonal ``[B, 2H] @ [2H, g*2H]`` matmul with gate-grouped
   columns, so the gate nonlinearities operate on contiguous ``[B, 2H]``
   lanes with no per-step reshuffling.  An optional Pallas kernel
   (ops/rnn_pallas.py) fuses the whole scan with weights pinned in VMEM.

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

SCAN_UNROLL = 8  # scan body replication; tuned on v5e (tools/profile_rnn.py)

# Pallas fused-scan kernels (ops/rnn_pallas.py).  Tri-state: None = auto
# (on when running on TPU), forced via PVA_USE_PALLAS=1/0 or by assigning
# the module global.  Unsupported shapes fall back to XLA automatically.
import os as _os

USE_PALLAS: bool | None = (
    None
    if "PVA_USE_PALLAS" not in _os.environ
    else _os.environ["PVA_USE_PALLAS"] == "1"
)
_AUTO_PALLAS: bool | None = None

# Whole-stack time-major path: keep the inter-layer stream [T, B, 2H]
# across every fused layer kernel instead of transposing to batch-major and
# back around each one (two [B,T,2H] transpose materializations per
# boundary), and fuse concat+mask+dropout into one elementwise pass.
# PVA_RNN_TM=0 restores the per-layer path (A/B: tools/ab_rnn_tm.py).
STACK_TM: bool = _os.environ.get("PVA_RNN_TM", "1") == "1"


def _pallas_enabled() -> bool:
    global _AUTO_PALLAS
    if USE_PALLAS is not None:
        return USE_PALLAS
    if _AUTO_PALLAS is None:
        _AUTO_PALLAS = jax.default_backend() == "tpu"
    return _AUTO_PALLAS


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


def _n_gates(cell: str) -> int:
    return 4 if cell == "lstm" else 3


def _pack_gate_grouped(mats: list[jax.Array], h: int, n_gates: int) -> jax.Array:
    """Pack per-direction hidden weights ``[H, g*H]`` into a block-diagonal
    ``[D*H, g*D*H]`` with *gate-grouped* columns:
    output layout ``[gate0_dir0 | gate0_dir1 | gate1_dir0 | ...]`` so the scan
    body slices gates as contiguous ``[B, D*H]`` chunks."""
    d = len(mats)
    w = jnp.zeros((d * h, n_gates * d * h), mats[0].dtype)
    for di, m in enumerate(mats):
        for g in range(n_gates):
            w = w.at[
                di * h : (di + 1) * h,
                g * d * h + di * h : g * d * h + (di + 1) * h,
            ].set(m[:, g * h : (g + 1) * h])
    return w


def _pack_gate_grouped_vec(vecs: list[jax.Array], h: int, n_gates: int) -> jax.Array:
    """Same gate-grouped packing for bias vectors ``[g*H]`` -> ``[g*D*H]``."""
    d = len(vecs)
    return jnp.concatenate(
        [vecs[di][g * h : (g + 1) * h] for g in range(n_gates) for di in range(d)]
    )


def _scan_packed(cell: str, xg, wh, bh, mask, width: int):
    """Scan over time with gate-grouped packed tensors.

    xg: [T, B, g*W] input gates (+bi [, +bh for lstm]); wh: [W, g*W];
    bh: [g*W] (GRU only); mask: [T, B, 1]; W = hidden width (H or 2H).
    Returns ys [T, B, W].
    """
    w = width
    b = xg.shape[1]
    h0 = jnp.zeros((b, w), xg.dtype)

    if _pallas_enabled():
        if cell == "gru":
            from .rnn_pallas import gru_scan

            ys = gru_scan(xg, wh, bh, mask)
        else:
            from .rnn_pallas import lstm_scan

            ys = lstm_scan(xg, wh, mask)  # biases already folded into xg
        if ys is not None:
            return ys

    if cell == "lstm":
        def step(carry, inp):
            hp, cp = carry
            g_x, m = inp
            gates = g_x + hp @ wh
            i = jax.nn.sigmoid(gates[:, :w])
            f = jax.nn.sigmoid(gates[:, w : 2 * w])
            g = jnp.tanh(gates[:, 2 * w : 3 * w])
            o = jax.nn.sigmoid(gates[:, 3 * w :])
            c = f * cp + i * g
            hn = o * jnp.tanh(c)
            hn = jnp.where(m, hn, hp)
            c = jnp.where(m, c, cp)
            return (hn, c), hn * m

        (_, _), ys = jax.lax.scan(step, (h0, h0), (xg, mask), unroll=SCAN_UNROLL)
    else:
        def step(hp, inp):
            g_x, m = inp
            hg = hp @ wh + bh
            r = jax.nn.sigmoid(g_x[:, :w] + hg[:, :w])
            z = jax.nn.sigmoid(g_x[:, w : 2 * w] + hg[:, w : 2 * w])
            n = jnp.tanh(g_x[:, 2 * w :] + r * hg[:, 2 * w :])
            hn = (1.0 - z) * n + z * hp
            hn = jnp.where(m, hn, hp)
            return hn, hn * m

        _, ys = jax.lax.scan(step, h0, (xg, mask), unroll=SCAN_UNROLL)
    return ys


def _layer_inputs(cell, p, x):
    """Input projection for one direction: [B, T, gH]."""
    if cell == "lstm":
        return x @ p["wi"] + p["bi"] + p["bh"]  # fold both biases into gates
    return x @ p["wi"] + p["bi"]  # GRU hidden bias stays inside the reset gate


def _interleave_gates(parts: list[jax.Array], h: int, n_gates: int) -> jax.Array:
    """Per-direction input gates ``[B, T, g*H]`` -> gate-grouped ``[B, T, g*D*H]``."""
    return jnp.concatenate(
        [p[..., g * h : (g + 1) * h] for g in range(n_gates) for p in parts],
        axis=-1,
    )


def _pack_dir_cols(mat: jax.Array, h: int, n_gates: int, d_index: int,
                   n_dirs: int = 2) -> jax.Array:
    """Scatter one direction's input weights ``[D, g*H]`` into the
    gate-grouped column layout ``[D, g*n_dirs*H]`` (zeros at the other
    directions' columns).  Projecting with these pre-scattered weights makes
    the MXU emit the gate-grouped xg DIRECTLY — ``x @ wi2_f + x_rev @ wi2_b``
    — which is bit-exact vs projecting then interleaving (the zero blocks
    contribute exact 0.0) but skips the interleave entirely.  Measured: the
    gate-interleave concat + its transposed backward were ~10 ms of the
    26.9 ms bigru train step (profiler, docs/PERF_NOTES.md round 4); the 2x
    zero-block matmul waste costs ~1-2 ms against it."""
    d_in = mat.shape[0]
    out = jnp.zeros((d_in, n_gates * n_dirs * h), mat.dtype)
    for g in range(n_gates):
        out = out.at[
            :, g * n_dirs * h + d_index * h : g * n_dirs * h + (d_index + 1) * h
        ].set(mat[:, g * h : (g + 1) * h])
    return out


def _run_direction(
    cell: str,
    p: dict,
    x: jax.Array,
    lengths: jax.Array,
    mask_bt: jax.Array,
    hidden_dim: int,
    reverse: bool,
):
    """Single-direction layer (also the pluggable unit for the Pallas path)."""
    if reverse:
        x = masked_reverse(x, lengths)
    xg = jnp.swapaxes(_layer_inputs(cell, p, x), 0, 1)  # [T, B, gH]
    m = jnp.swapaxes(mask_bt.astype(x.dtype)[:, :, None], 0, 1)
    ys = _scan_packed(cell, xg, p["wh"], p["bh"], m, hidden_dim)
    ys = jnp.swapaxes(ys, 0, 1)
    if reverse:
        ys = masked_reverse(ys, lengths)
    return ys


def _pack_bidir(cell: str, layer: dict, h: int, g: int):
    """Gate-grouped packed (b2, wh, bh) for the merged-step paths."""
    if cell == "lstm":  # both biases fold into the gates (see _layer_inputs)
        b2 = _pack_gate_grouped_vec(
            [layer["fwd"]["bi"] + layer["fwd"]["bh"],
             layer["bwd"]["bi"] + layer["bwd"]["bh"]], h, g)
    else:  # GRU hidden bias stays inside the reset gate
        b2 = _pack_gate_grouped_vec(
            [layer["fwd"]["bi"], layer["bwd"]["bi"]], h, g)
    wh = _pack_gate_grouped([layer["fwd"]["wh"], layer["bwd"]["wh"]], h, g)
    bh = _pack_gate_grouped_vec([layer["fwd"]["bh"], layer["bwd"]["bh"]], h, g)
    return b2, wh, bh


def _fused_layer_tm(cell, layer, xt, len_run, h, interpret):
    """One fused bidirectional layer on a TIME-major ``[T, B, W]`` stream:
    dispatch to the split/merged Pallas layer kernel (ops/rnn_fused_pallas).
    Returns ``(ysf, ysb)`` both ``[T, B, H]`` in original time order,
    unmasked."""
    from . import rnn_fused_pallas as F

    g = _n_gates(cell)
    lf, lb = layer["fwd"], layer["bwd"]
    if F.SPLIT:
        # direction-split step bodies consume raw torch layouts —
        # no packing (or its transposed VJP) ever traces
        if cell == "gru":
            return F.gru_bidir_fused_split(
                xt, lf["wi"], lb["wi"], lf["bi"], lb["bi"],
                lf["wh"], lb["wh"], lf["bh"], lb["bh"], len_run, interpret)
        # lstm folds both biases into the gates
        return F.lstm_bidir_fused_split(
            xt, lf["wi"], lb["wi"], lf["bi"] + lf["bh"],
            lb["bi"] + lb["bh"], lf["wh"], lb["wh"], len_run, interpret)
    b2, wh, bh = _pack_bidir(cell, layer, h, g)
    # input weights go in DENSE (torch weight_ih layout) — the kernel
    # merges gates in-kernel, so no _pack_dir_cols scatter (or its
    # transposed VJP) ever traces on this path
    if cell == "gru":
        return F.gru_bidir_fused(
            xt, lf["wi"], lb["wi"], b2, wh, bh, len_run, interpret)
    # lstm: biases pre-folded, no hidden bias operand
    return F.lstm_bidir_fused(xt, lf["wi"], lb["wi"], b2, wh, len_run,
                              interpret)


def _stack_tm_ok(cell, layers, x, hidden_dim) -> bool:
    """True when EVERY layer of the stack fits the fused layer kernel, so
    the whole stack can stay time-major (mixed stacks fall back to the
    per-layer path, which picks fused/XLA layer by layer)."""
    if not _pallas_enabled():
        return False
    from . import rnn_fused_pallas as F

    b_run = x.shape[0] + ((-x.shape[0]) % 8)
    t_len = x.shape[1]
    sup = F.supported if cell == "gru" else F.lstm_supported
    w_in = x.shape[-1]
    for _ in layers:
        if not sup(t_len, b_run, hidden_dim, w_in, x.dtype):
            return False
        w_in = 2 * hidden_dim
    return True


def _run_stack_fused_tm(
    cell: str,
    layers: list[dict],
    x: jax.Array,
    lengths: jax.Array,
    hidden_dim: int,
    dropout_rate: float,
    train: bool,
    rng,
):
    """The whole bidirectional stack on ONE time-major stream.

    The per-layer path transposes ``[B,T,2H] <-> [T,B,2H]`` around every
    layer kernel, so each inter-layer boundary materializes two transposes
    plus separate concat/mask/dropout passes (round-4 profile: the fused
    kernels are at roofline, the residual bigru step time is this glue).
    Here the stream stays time-major across the stack — one transpose in,
    one out — and each boundary is a single fused elementwise pass
    (concat + validity mask + inter-layer dropout).

    Dropout stream equality: masks are drawn with BATCH-major index strides
    (``hashmask.keep_mask(strides=...)``), so every element sees the exact
    mask bit the per-layer/XLA paths give it — the stream depends on the
    element's ``(b*T + t)*2H + c`` index, which is invariant both to the
    time-major layout and to the 8-row batch pad (row ``b``'s indices never
    reference ``b_run``).  Pinned by tests/test_rnn_stack_tm.py.

    Reference semantics: ``torch.nn.GRU/LSTM(bidirectional=True,
    dropout=...)`` (``networks.py:143-167``) — inter-layer dropout on every
    layer's output except the last, padded steps emit zeros.
    """
    b_sz, t_len = x.shape[0], x.shape[1]
    h = hidden_dim
    b_pad = (-b_sz) % 8
    x_run, len_run = x, lengths
    if b_pad:
        x_run = jnp.pad(x, ((0, b_pad), (0, 0), (0, 0)))
        len_run = jnp.pad(lengths, (0, b_pad))
    b_run = b_sz + b_pad
    interpret = jax.default_backend() != "tpu"
    # time-major validity mask [T, B, 1]
    mask_tb = (
        jnp.arange(t_len, dtype=jnp.int32)[:, None] < len_run[None, :]
    ).astype(x.dtype)[:, :, None]
    out = jnp.swapaxes(x_run, 0, 1)  # [T, B, W]
    drop_site = train and dropout_rate > 0.0 and rng is not None
    keep = 1.0 - dropout_rate
    from . import hashmask
    from . import rnn_fused_pallas as F

    # Fused layer boundaries (PVA_RNN_FUSED_BOUNDARY, GRU split stack):
    # layers 1+ consume the previous layer's raw halves and run
    # concat*mask [-> hash dropout] in-kernel; the rng split sequence and
    # the strided fmix32 stream are IDENTICAL to the glue path below, so
    # the flag never changes values (tests/test_rnn_fused.py).
    use_bnd = (F.FUSED_BOUNDARY and F.SPLIT and cell == "gru"
               and len(layers) > 1
               and (not drop_site or hashmask.MODEL_DROPOUT))
    if use_bnd:
        ysf = ysb = None
        pend = (None, None, None)  # (seed, thresh, inv_keep) for boundary
        for li, layer in enumerate(layers):
            if li == 0:
                ysf, ysb = _fused_layer_tm(cell, layer, out, len_run, h,
                                           interpret)
            else:
                lf, lb = layer["fwd"], layer["bwd"]
                seed, thresh, inv = pend
                ysf, ysb = F.gru_bidir_fused_split_bnd(
                    ysf, ysb, lf["wi"], lb["wi"], lf["bi"], lb["bi"],
                    lf["wh"], lb["wh"], lf["bh"], lb["bh"], len_run,
                    jnp.uint32(0) if seed is None else seed,
                    interpret, thresh, inv)
            if drop_site and li < len(layers) - 1:
                rng, sub = jax.random.split(rng)
                pend = (hashmask.rng_seed_u32(sub),
                        hashmask.threshold(keep), 1.0 / keep)
            else:
                pend = (None, None, None)
        out = jnp.concatenate([ysf, ysb], axis=-1) * mask_tb
        out = jnp.swapaxes(out, 0, 1)
        if b_pad:
            out = out[:b_sz]
        return out

    for li, layer in enumerate(layers):
        ysf, ysb = _fused_layer_tm(cell, layer, out, len_run, h, interpret)
        out = jnp.concatenate([ysf, ysb], axis=-1) * mask_tb
        if drop_site and li < len(layers) - 1:
            rng, sub = jax.random.split(rng)

            if hashmask.MODEL_DROPOUT:
                # batch-major-strided mask: identical stream to the
                # per-layer path's hash_dropout on [B, T, 2H]
                km = hashmask.keep_mask(
                    hashmask.rng_seed_u32(sub), out.shape,
                    hashmask.threshold(keep),
                    strides=(2 * h, t_len * 2 * h, 1))
                out = jnp.where(
                    km, out * (1.0 / keep), jnp.zeros((), out.dtype))
            else:
                # threefry draws over the UNPADDED batch-major shape (the
                # per-layer path's stream depends on it), padded with keeps
                bern = jax.random.bernoulli(
                    sub, keep, (b_sz, t_len, 2 * h))
                if b_pad:
                    bern = jnp.pad(
                        bern, ((0, b_pad), (0, 0), (0, 0)),
                        constant_values=True)
                out = out * jnp.swapaxes(bern, 0, 1) / keep
    out = jnp.swapaxes(out, 0, 1)
    if b_pad:
        out = out[:b_sz]
    return out


def _run_bidir_fused(
    cell: str,
    layer: dict,
    x: jax.Array,
    lengths: jax.Array,
    mask_bt: jax.Array,
    hidden_dim: int,
):
    """Both directions in ONE scan: the backward stream consumes the
    length-aware time-reversed input, so a single pass over t covers fwd[t]
    and bwd[len-1-t] simultaneously on ``[B, 2H]`` lanes."""
    h = hidden_dim
    g = _n_gates(cell)

    if _pallas_enabled():
        # whole-layer fused kernel: in-kernel projection, reversal via block
        # index maps (no masked_reverse gathers), carry freeze for padding
        from . import rnn_fused_pallas as F

        b_sz, t_len = x.shape[0], x.shape[1]
        # small batches (e.g. the attn model's whole-video regime) are padded
        # up to the kernel's 8-row granularity: pad rows get lengths=0, so
        # the backward chain stays frozen, the forward chain sees zero dy
        # through the slice VJP, and weight grads are untouched — exact.
        b_pad = (-b_sz) % 8
        b_run = b_sz + b_pad
        ok = (F.supported if cell == "gru" else F.lstm_supported)(
            t_len, b_run, h, x.shape[-1], x.dtype)
        if ok:
            interpret = jax.default_backend() != "tpu"
            x_run, len_run = x, lengths
            if b_pad:
                x_run = jnp.pad(x, ((0, b_pad), (0, 0), (0, 0)))
                len_run = jnp.pad(lengths, (0, b_pad))
            xt = jnp.swapaxes(x_run, 0, 1)
            ysf, ysb = _fused_layer_tm(cell, layer, xt, len_run, h, interpret)
            ys = jnp.swapaxes(jnp.concatenate([ysf, ysb], axis=-1), 0, 1)
            if b_pad:
                ys = ys[:b_sz]
            return ys * mask_bt.astype(x.dtype)[:, :, None]

    # XLA fallback: project DIRECTLY into the gate-grouped layout via
    # pre-scattered weight columns (see _pack_dir_cols) instead of
    # projecting then interleaving
    b2, wh, bh = _pack_bidir(cell, layer, h, g)
    wi2_f = _pack_dir_cols(layer["fwd"]["wi"], h, g, 0)
    wi2_b = _pack_dir_cols(layer["bwd"]["wi"], h, g, 1)
    x_rev = masked_reverse(x, lengths)
    xg = jnp.swapaxes(x @ wi2_f + x_rev @ wi2_b + b2, 0, 1)  # [T,B,g*2H]
    m = jnp.swapaxes(mask_bt.astype(x.dtype)[:, :, None], 0, 1)
    ys = jnp.swapaxes(_scan_packed(cell, xg, wh, bh, m, 2 * h), 0, 1)  # [B,T,2H]
    y_f, y_b = ys[..., :h], ys[..., h:]
    return jnp.concatenate([y_f, masked_reverse(y_b, lengths)], axis=-1)


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
    if (STACK_TM and scan_impl is None and bidirectional
            and _stack_tm_ok(cell, layers, x, hidden_dim)):
        return _run_stack_fused_tm(
            cell, layers, x, lengths, hidden_dim, dropout_rate, train, rng)
    mask_bt = length_mask(lengths, t)
    out = x
    for li, layer in enumerate(layers):
        if scan_impl is not None:
            fwd = scan_impl(cell, layer["fwd"], out, lengths, mask_bt, hidden_dim, False)
            if bidirectional:
                bwd = scan_impl(cell, layer["bwd"], out, lengths, mask_bt, hidden_dim, True)
                out = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                out = fwd
        elif bidirectional:
            out = _run_bidir_fused(cell, layer, out, lengths, mask_bt, hidden_dim)
        else:
            out = _run_direction(
                cell, layer["fwd"], out, lengths, mask_bt, hidden_dim, False
            )
        if train and dropout_rate > 0.0 and li < len(layers) - 1 and rng is not None:
            rng, sub = jax.random.split(rng)
            keep = 1.0 - dropout_rate
            from . import hashmask

            if hashmask.MODEL_DROPOUT:
                # hash-stream masks (see models/common.py dropout note)
                out = hashmask.hash_dropout(sub, out, keep)
            else:
                out = out * jax.random.bernoulli(sub, keep, out.shape) / keep
    return out


lstm_apply = partial(rnn_apply, "lstm")
gru_apply = partial(rnn_apply, "gru")
