#!/usr/bin/env python
"""Benchmark: flagship BiGRU training-step throughput on one TPU chip vs. the
reference's PyTorch-CPU equivalent (BASELINE.json metric: frames/sec/chip;
north-star >= 10x the PyTorch CPU reference).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

B = int(os.environ.get("PVA_BENCH_B", 16))
T = int(os.environ.get("PVA_BENCH_T", 1024))
N_CLASS = 48
STEPS = int(os.environ.get("PVA_BENCH_STEPS", 20))
REF_STEPS = int(os.environ.get("PVA_BENCH_REF_STEPS", 2))


def _batch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, 400)).astype(np.float32)
    lengths = np.full((B,), T, dtype=np.int32)
    targets = rng.integers(0, N_CLASS, size=(B, T)).astype(np.int64)
    mask = np.ones((B, T), dtype=bool)
    return x, lengths, targets.reshape(-1), mask


def bench_tpu() -> float:
    import jax

    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.train import Trainer

    model = build_model("bigru", N_CLASS, defaults=True)
    trainer = Trainer(model, N_CLASS, lr=1e-3, seed=0)
    ts = trainer.init_state()
    batch = _batch()

    # warmup / compile
    for _ in range(2):
        loss = trainer.train_step(ts, batch)
    jax.block_until_ready(ts.params)

    start = time.perf_counter()
    for _ in range(STEPS):
        loss = trainer.train_step(ts, batch)
    jax.block_until_ready((ts.params, loss))
    elapsed = time.perf_counter() - start
    return B * T * STEPS / elapsed


def bench_torch_cpu() -> float:
    """Reference-equivalent workload: torch BiGRU (4-layer bidirectional,
    hidden 256) forward+backward+Adam on CPU, same shapes."""
    import torch

    torch.manual_seed(0)

    class RefBiGRU(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.drop = torch.nn.Dropout(0.5)
            self.rnn = torch.nn.GRU(
                input_size=400, hidden_size=128, num_layers=4,
                batch_first=True, bidirectional=True, dropout=0.5,
            )
            self.out = torch.nn.Linear(256, N_CLASS)

        def forward(self, x):
            h, _ = self.rnn(self.drop(x))
            return torch.log_softmax(self.out(h.reshape(-1, 256)), dim=1)

    net = RefBiGRU()
    crit = torch.nn.NLLLoss(ignore_index=-1)
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    x = torch.randn(B, T, 400)
    y = torch.randint(0, N_CLASS, (B * T,))

    # one warmup step, then timed steps
    for _ in range(1):
        opt.zero_grad()
        crit(net(x), y).backward()
        opt.step()
    start = time.perf_counter()
    for _ in range(REF_STEPS):
        opt.zero_grad()
        crit(net(x), y).backward()
        opt.step()
    elapsed = time.perf_counter() - start
    return B * T * REF_STEPS / elapsed


def main():
    baseline_fps = None
    if os.environ.get("PVA_BENCH_SKIP_REF") != "1":
        baseline_fps = bench_torch_cpu()
        print(f"# torch-cpu reference: {baseline_fps:,.0f} frames/sec", file=sys.stderr)
    fps = bench_tpu()
    print(f"# tpu: {fps:,.0f} frames/sec", file=sys.stderr)
    result = {
        "metric": "bigru_train_step_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 2) if baseline_fps else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
