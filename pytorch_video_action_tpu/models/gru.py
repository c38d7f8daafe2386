"""BiGRU (reference ``networks.py:143-167``) — also backs the ``ctcloss``
model, which is a BiGRU with ``n_class + 1`` outputs (blank = last id,
reference ``train.py:253-254``)."""

from __future__ import annotations

from dataclasses import dataclass

import jax

from ..ops.rnn import gru_apply, init_rnn
from .common import dropout, init_linear, linear, log_softmax, split_rng


@dataclass(frozen=True)
class BiGRUConfig:
    input_dim: int = 400
    gru_layer: int = 4
    hidden_dim_1: int = 256
    dropout_rate: float = 0.5
    hidden_dim_2: int = 64  # declared-but-unused `linear` in the reference (:155)
    n_class: int = 48


def init(rng, cfg: BiGRUConfig) -> dict:
    r1, r2 = jax.random.split(rng)
    return {
        "rnn": init_rnn(
            r1, cfg.input_dim, cfg.hidden_dim_1 // 2, cfg.gru_layer,
            bidirectional=True, n_gates=3,
        ),
        "output": init_linear(r2, cfg.hidden_dim_1, cfg.n_class),
    }


def apply(params, cfg: BiGRUConfig, x, lengths, *, train=False, rng=None):
    r_in, r_rnn = split_rng(rng, 2)
    x = dropout(r_in, x, cfg.dropout_rate, train)
    out = gru_apply(
        params["rnn"], x, lengths, cfg.hidden_dim_1 // 2,
        bidirectional=True, dropout_rate=cfg.dropout_rate, train=train, rng=r_rnn,
    )
    return log_softmax(linear(params["output"], out))  # [B, T, C]
