#!/usr/bin/env python
"""Benchmark: flagship BiGRU training-step throughput on one TPU chip vs. the
reference's PyTorch-CPU equivalent (BASELINE.json metric: frames/sec/chip;
north-star >= 10x the PyTorch CPU reference).

Measurement discipline: the TPU side chains N full train steps inside ONE
jitted ``lax.fori_loop`` (params evolve step to step) and fetches the final
loss scalar — immune to async-dispatch / identical-call caching artifacts of
the device tunnel.  Both sides run the same shapes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

B = int(os.environ.get("PVA_BENCH_B", 64))
T = int(os.environ.get("PVA_BENCH_T", 1024))
N_CLASS = 48
STEPS = int(os.environ.get("PVA_BENCH_STEPS", 10))
REF_STEPS = int(os.environ.get("PVA_BENCH_REF_STEPS", 1))
# bf16 mixed precision (f32 master weights/softmax/loss) — the TPU-native
# production configuration; validated for training quality in
# tests/test_training.py::test_bf16_mixed_precision_training_learns
DTYPE = os.environ.get("PVA_BENCH_DTYPE", "bfloat16")


def bench_tpu() -> float:
    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.train.losses import nll_loss

    model = build_model("bigru", N_CLASS, defaults=True)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)

    cd = jnp.dtype(DTYPE) if DTYPE != "float32" else None
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, 400)).astype(np.float32))
    lengths = jnp.full((B,), T, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, N_CLASS, size=(B * T,)))
    key = jax.random.PRNGKey(1)

    def loss_fn(p, rng_i):
        if cd is not None:  # mixed precision: f32 master -> bf16 body
            p = jax.tree.map(lambda a: a.astype(cd), p)
        out = model.apply(p, x.astype(cd) if cd is not None else x,
                          lengths, train=True, rng=rng_i)
        return nll_loss(out, targets)

    @jax.jit
    def run(params, opt_state):
        def body(i, carry):
            p, s, _ = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, jax.random.fold_in(key, i))
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, loss)

        return jax.lax.fori_loop(0, STEPS, body, (params, opt_state, 0.0))

    out = run(params, opt_state)  # compile + first run
    float(out[2])
    start = time.perf_counter()
    out = run(params, opt_state)
    final_loss = float(out[2])  # forces full execution
    elapsed = time.perf_counter() - start
    assert np.isfinite(final_loss)
    return B * T * STEPS / elapsed


def bench_torch_cpu() -> float:
    """Reference-equivalent workload: torch BiGRU (4-layer bidirectional,
    hidden 256, dropout 0.5) forward+backward+Adam on CPU, same shapes."""
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

    opt.zero_grad()  # warmup step
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
