#!/usr/bin/env python
"""Throughput experiments for the GRU scan core on the real TPU.

Variants:
  base      — current rnn.py path (per-direction scans)
  fused     — both directions in one scan body via batched einsum
  unrollN   — scan unroll factor sweep
Run: python tools/profile_rnn.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_video_action_tpu.models import build_model
from pytorch_video_action_tpu.train import Trainer

B, T, N_CLASS = 16, 1024, 48


def timeit(fn, *args, steps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / steps


def bench_train(label):
    model = build_model("bigru", N_CLASS, defaults=True)
    trainer = Trainer(model, N_CLASS, lr=1e-3, seed=0)
    ts = trainer.init_state()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, 400)).astype(np.float32)
    lengths = np.full((B,), T, dtype=np.int32)
    targets = rng.integers(0, N_CLASS, size=(B * T,)).astype(np.int64)
    mask = np.ones((B, T), dtype=bool)
    batch = (x, lengths, targets, mask)
    for _ in range(2):
        trainer.train_step(ts, batch)
    jax.block_until_ready(ts.params)
    start = time.perf_counter()
    n = 10
    for _ in range(n):
        loss = trainer.train_step(ts, batch)
    jax.block_until_ready((ts.params, loss))
    dt = (time.perf_counter() - start) / n
    print(f"{label}: {dt*1e3:.1f} ms/step  {B*T/dt:,.0f} frames/s")


if __name__ == "__main__":
    import pytorch_video_action_tpu.ops.rnn as rnn

    for unroll in [8, 16, 32]:
        rnn.SCAN_UNROLL = unroll
        bench_train(f"unroll={unroll} fused={getattr(rnn, 'FUSE_BIDIR', None)}")
