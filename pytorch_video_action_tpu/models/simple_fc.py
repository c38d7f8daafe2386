"""SimpleFC: per-frame MLP 400 -> 256 -> 128 -> 32 -> n_class.

Reference: ``networks.py:9-22``.  Returns **raw logits** (the reference quirk:
no log_softmax, yet trained with NLLLoss — preserved because it affects
training dynamics; documented in README deviations).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

from .common import init_linear, linear


@dataclass(frozen=True)
class SimpleFCConfig:
    input_dim: int = 400
    n_class: int = 48


def init(rng, cfg: SimpleFCConfig) -> dict:
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    return {
        "fc1": init_linear(r1, cfg.input_dim, 256),
        "fc2": init_linear(r2, 256, 128),
        "fc3": init_linear(r3, 128, 32),
        "fc4": init_linear(r4, 32, cfg.n_class),
    }


def apply(params, cfg: SimpleFCConfig, x, lengths, *, train=False, rng=None):
    del lengths, train, rng  # per-frame model, no sequence state or dropout
    h = jax.nn.relu(linear(params["fc1"], x))
    h = jax.nn.relu(linear(params["fc2"], h))
    h = jax.nn.relu(linear(params["fc3"], h))
    return linear(params["fc4"], h)  # [B, T, C] raw logits
