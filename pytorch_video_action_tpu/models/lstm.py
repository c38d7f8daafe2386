"""LSTM model family: vanillaLSTM, BiLSTM, BiLSTMWithLM.

References: ``networks.py:24-48`` (vanillaLSTM), ``:50-87`` (BiLSTM),
``:89-141`` (BiLSTMWithLM).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.masking import masked_mean, length_mask, take_last_valid
from ..ops.rnn import init_rnn, lstm_apply
from .common import dropout, init_linear, linear, log_softmax, split_rng


# --------------------------------------------------------------- vanillaLSTM


@dataclass(frozen=True)
class VanillaLSTMConfig:
    input_dim: int = 400
    lstm_layer: int = 1
    dropout_rate: float = 0.0
    hidden_dim: int = 64
    n_class: int = 48
    mode: str = "cont"


def init_vanilla_lstm(rng, cfg: VanillaLSTMConfig) -> dict:
    r1, r2 = jax.random.split(rng)
    return {
        "rnn": init_rnn(
            r1, cfg.input_dim, cfg.hidden_dim, cfg.lstm_layer,
            bidirectional=False, n_gates=4,
        ),
        "linear": init_linear(r2, cfg.hidden_dim, cfg.n_class),
    }


def apply_vanilla_lstm(params, cfg: VanillaLSTMConfig, x, lengths, *, train=False, rng=None):
    out = lstm_apply(
        params["rnn"], x, lengths, cfg.hidden_dim,
        bidirectional=False, dropout_rate=cfg.dropout_rate, train=train, rng=rng,
    )
    if cfg.mode == "last":
        out = take_last_valid(out, lengths)  # [B, H]
    return log_softmax(linear(params["linear"], out))


# -------------------------------------------------------------------- BiLSTM


@dataclass(frozen=True)
class BiLSTMConfig:
    input_dim: int = 400
    lstm_layer: int = 2
    hidden_dim_1: int = 256
    dropout_rate: float = 0.5
    hidden_dim_2: int = 64
    n_class: int = 48
    mode: str = "cont"


def init_bilstm(rng, cfg: BiLSTMConfig) -> dict:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "rnn": init_rnn(
            r1, cfg.input_dim, cfg.hidden_dim_1 // 2, cfg.lstm_layer,
            bidirectional=True, n_gates=4,
        ),
        "linear": init_linear(r2, cfg.hidden_dim_1, cfg.hidden_dim_2),
        "output": init_linear(r3, cfg.hidden_dim_2, cfg.n_class),
        # reference declares an unused BatchNorm1d (networks.py:65); omitted.
    }


def apply_bilstm(params, cfg: BiLSTMConfig, x, lengths, *, train=False, rng=None):
    r_in, r_rnn, r_mid = split_rng(rng, 3)
    x = dropout(r_in, x, cfg.dropout_rate, train)
    out = lstm_apply(
        params["rnn"], x, lengths, cfg.hidden_dim_1 // 2,
        bidirectional=True, dropout_rate=cfg.dropout_rate, train=train, rng=r_rnn,
    )
    if cfg.mode == "last":
        out = take_last_valid(out, lengths)  # [B, H1]
    hidden = linear(params["linear"], out)
    if cfg.mode == "avg":
        hidden = masked_mean(hidden, length_mask(lengths, x.shape[1]))  # [B, H2]
    hidden = dropout(r_mid, jax.nn.relu(hidden), cfg.dropout_rate, train)
    return log_softmax(linear(params["output"], hidden))


# -------------------------------------------------------------- BiLSTMWithLM


@dataclass(frozen=True)
class BiLSTMWithLMConfig:
    input_dim: int = 400
    lstm_layer: int = 2
    hidden_dim_1: int = 256
    dropout_rate: float = 0.5
    hidden_dim_2: int = 64
    n_class: int = 48
    context: int = 2


def init_bilstm_lm(rng, cfg: BiLSTMWithLMConfig) -> tuple[dict, dict]:
    """Returns (params, state). ``state`` carries BatchNorm running stats —
    the only stateful pieces in the zoo (reference ``networks.py:103-105``)."""
    r1, r2, r3 = jax.random.split(rng, 3)
    params = {
        "rnn": init_rnn(
            r1, cfg.input_dim, cfg.hidden_dim_1 // 2, cfg.lstm_layer,
            bidirectional=True, n_gates=4,
        ),
        "linear": init_linear(r2, cfg.hidden_dim_1, cfg.hidden_dim_2),
        "output": init_linear(
            r3, cfg.context * cfg.n_class + cfg.hidden_dim_2, cfg.n_class
        ),
        "bn1": {"scale": jnp.ones(cfg.hidden_dim_1), "bias": jnp.zeros(cfg.hidden_dim_1)},
        "bn2": {"scale": jnp.ones(cfg.hidden_dim_2), "bias": jnp.zeros(cfg.hidden_dim_2)},
    }
    state = {
        "bn1": {"mean": jnp.zeros(cfg.hidden_dim_1), "var": jnp.ones(cfg.hidden_dim_1)},
        "bn2": {"mean": jnp.zeros(cfg.hidden_dim_2), "var": jnp.ones(cfg.hidden_dim_2)},
    }
    return params, state


def _batch_norm(p, s, x, train: bool, momentum=0.1, eps=1e-5, valid=None):
    """BatchNorm1d over flattened rows.  ``valid [N, 1]`` excludes padded
    frames from the batch statistics — the reference trains on exact-length
    batches (no padding), so masked stats ARE the parity behavior under
    bucket-rounded padding."""
    if train:
        if valid is None:
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)
            n = x.shape[0]
        else:
            n = jnp.maximum(jnp.sum(valid), 1.0)
            mean = jnp.sum(x * valid, axis=0) / n
            var = jnp.sum(((x - mean) ** 2) * valid, axis=0) / n
        unbiased = var * n / jnp.maximum(n - 1, 1)
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y, new_s


def apply_bilstm_lm(
    params, cfg: BiLSTMWithLMConfig, x, lengths, *, train=False, rng=None, state=None
):
    """Stateful per-frame context loop, functionalized.

    The reference walks the flattened ``[B*T]`` rows sequentially carrying the
    last ``context`` frames' detached log-probs, resetting at video boundaries
    computed from ``np.cumsum(x_len)`` (``networks.py:123-140``; only correct
    at batch size 1 where row offsets match cumulative lengths).  Here the
    context scan runs *per video* over time with carry-freeze on padded steps
    — the documented intent, exact at batch 1.  Returns (log_probs, state).
    """
    assert state is not None, "bilstm_lm is stateful: pass state from init"
    b, t, _ = x.shape
    r_in, r_rnn = split_rng(rng, 2)
    xd = dropout(r_in, x, cfg.dropout_rate, train)
    out = lstm_apply(
        params["rnn"], xd, lengths, cfg.hidden_dim_1 // 2,
        bidirectional=True, dropout_rate=cfg.dropout_rate, train=train, rng=r_rnn,
    )
    mask = length_mask(lengths, t)
    # BatchNorm statistics always in f32: bf16 sums/counts over B*T rows
    # round badly (integers above 256 are not representable), violating the
    # mixed-precision policy of full-precision normalization
    valid = mask.reshape(-1, 1).astype(jnp.float32)
    flat = out.reshape(-1, cfg.hidden_dim_1).astype(jnp.float32)
    flat, s1 = _batch_norm(params["bn1"], state["bn1"], flat, train, valid=valid)
    hidden = jnp.tanh(linear(params["linear"], flat.astype(x.dtype)))
    hidden, s2 = _batch_norm(
        params["bn2"], state["bn2"], hidden.astype(jnp.float32), train,
        valid=valid,
    )
    hidden = hidden.astype(x.dtype).reshape(b, t, cfg.hidden_dim_2)
    ctx_dim = cfg.context * cfg.n_class
    w, bias = params["output"]["w"], params["output"]["b"]
    w_ctx, w_hid = w[:ctx_dim], w[ctx_dim:]
    base = jnp.swapaxes(hidden @ w_hid + bias, 0, 1)  # [T, B, C] precomputed

    def step(ctx, inp):
        base_t, m = inp  # [B, C], [B, 1]
        logits = base_t + ctx @ w_ctx
        logp = jax.nn.log_softmax(logits, axis=-1)
        new_ctx = jnp.concatenate(
            [ctx[:, cfg.n_class :], jax.lax.stop_gradient(logp)], axis=-1
        )
        ctx = jnp.where(m, new_ctx, ctx)
        return ctx, logp * m

    ctx0 = jnp.zeros((b, ctx_dim), x.dtype)
    m_t = jnp.swapaxes(mask.astype(x.dtype)[:, :, None], 0, 1)
    _, logps = jax.lax.scan(step, ctx0, (base, m_t))
    logps = jnp.swapaxes(logps, 0, 1)  # [B, T, C]
    return logps, {"bn1": s1, "bn2": s2}
