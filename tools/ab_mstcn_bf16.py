"""Interleaved A/B: ms_tcn tap-conv step/eval in bf16 mixed precision vs f32.

Motivation (tools/mxu_probe.py): the MXU runs big matmuls at ~74 TF/s in
BOTH f32 and bf16, so the tap-formulated conv stack is HBM-bound — and
bf16 activations halve the per-layer [B,T,C] traffic.  The earlier
"bf16 no-gain" result was measured on the conv-op formulation, which was
bound by the convolution emitter, not by bandwidth.

Mixed precision mirrors bench.py/`--dtype bfloat16`: f32 master params,
params+inputs cast to bf16 for the body, loss/Adam in f32.

Usage: python tools/ab_mstcn_bf16.py [--steps 10 --reps 5] [--eval]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--eval", action="store_true")
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.train.losses import make_loss_fn
    from pytorch_video_action_tpu.train.optim import make_optimizer

    n_class = 48
    model = build_model("ms_tcn", n_class, defaults=True)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    loss = make_loss_fn("ms_tcn", n_class)
    rng = np.random.default_rng(0)
    b, t = args.b, args.t
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32))
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    key = jax.random.PRNGKey(1)

    def make(cd):
        if args.eval:
            @jax.jit
            def run(p, _s):
                if cd is not None:
                    p = jax.tree.map(lambda a: a.astype(cd), p)
                xx = x.astype(cd) if cd is not None else x

                def body(i, acc):
                    l2 = lengths + jnp.isnan(acc).astype(jnp.int32)
                    out = model.apply(p, xx, l2, train=False)
                    return acc + out.mean().astype(jnp.float32)

                return (None, None,
                        jax.lax.fori_loop(0, args.steps, body, jnp.float32(0)))

            s0 = None
        else:
            def loss_fn(p, k):
                if cd is not None:
                    p = jax.tree.map(lambda a: a.astype(cd), p)
                out = model.apply(p, x.astype(cd) if cd is not None else x,
                                  lengths, train=True, rng=k)
                return loss(out, targets)

            @jax.jit
            def run(p, s):
                def body(i, carry):
                    pp, ss, _ = carry
                    l, g = jax.value_and_grad(loss_fn)(
                        pp, jax.random.fold_in(key, i))
                    u, ss = tx.update(g, ss, pp)
                    return (optax.apply_updates(pp, u), ss, l)

                return jax.lax.fori_loop(0, args.steps, body, (p, s, 0.0))

            s0 = tx.init(params)
        out = run(params, s0)
        assert np.isfinite(float(out[2]))
        return run, s0

    arms = {"f32": make(None), "bf16": make(jnp.bfloat16)}
    times = {k: [] for k in arms}
    for _ in range(args.reps):
        for name, (fn, s) in arms.items():
            t0 = time.perf_counter()
            float(fn(params, s)[2])
            times[name].append(time.perf_counter() - t0)
    frames = b * t * args.steps
    for name in arms:
        med = statistics.median(times[name])
        print(f"{name}: {med * 1000 / args.steps:7.2f} ms/step  "
              f"{frames / med:12,.0f} frames/s   {times[name]}")
    print(f"speedup (f32/bf16): "
          f"{statistics.median(times['f32']) / statistics.median(times['bf16']):.3f}x")


if __name__ == "__main__":
    main()
