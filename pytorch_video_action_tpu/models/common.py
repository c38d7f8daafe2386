"""Shared building blocks for the functional model zoo.

Models are plain pytrees (nested dicts of jnp arrays) with ``init``/``apply``
module-level functions — no framework classes on the compute path, so every
model jits/vmaps/shards cleanly and params map 1:1 onto reference tensors for
parity testing.  Linear init matches ``torch.nn.Linear`` (Kaiming-uniform with
a=sqrt(5) => ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` for weight and bias).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_linear(rng, in_dim: int, out_dim: int) -> dict:
    k = 1.0 / jnp.sqrt(in_dim)
    rw, rb = jax.random.split(rng)
    return {
        "w": jax.random.uniform(rw, (in_dim, out_dim), minval=-k, maxval=k),
        "b": jax.random.uniform(rb, (out_dim,), minval=-k, maxval=k),
    }


def linear(p: dict, x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def dropout(rng, x: jax.Array, rate: float, train: bool) -> jax.Array:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    from ..ops import hashmask

    if hashmask.MODEL_DROPOUT:
        # counter-hash mask stream (~7 int ops/word vs threefry's ~20+);
        # A/B-measured on the bigru/bilstm steps before defaulting
        # (docs/PERF_NOTES.md round-4 model-dropout entry)
        return hashmask.hash_dropout(rng, x, keep)
    return x * jax.random.bernoulli(rng, keep, x.shape) / keep


def log_softmax(x: jax.Array) -> jax.Array:
    # always in f32: under the bf16 mixed-precision policy the body computes
    # in bf16 but normalization/loss stay full precision (standard TPU recipe)
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


def split_rng(rng, n: int):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))
