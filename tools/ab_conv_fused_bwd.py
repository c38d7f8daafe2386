"""Interleaved A/B: fused single-pass Pallas layer backward
(PVA_CONV_FUSED_BWD, ops/conv_pallas._layer_bwd_kernel) vs plain autodiff
on the ms_tcn bench-regime train step (B=8, T=4096, bf16 mixed precision).

Motivation: the step decomposition put the backward at ~4.2 ms against a
~1.4 ms FLOP floor — saved relu/1x1 activations streaming through HBM.
The fused kernel recomputes the layer forward in VMEM and emits dx plus
all weight grads in one pass (the flash fused-backward playbook).

Usage: python tools/ab_conv_fused_bwd.py [--steps 50 --reps 5]
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
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--f32", action="store_true")
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
    tx, _ = make_optimizer(5e-4, 30, 1.0)
    loss = make_loss_fn("ms_tcn", n_class)
    rng = np.random.default_rng(0)
    b, t = args.b, args.t
    cd = None if args.f32 else jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32))
    if cd is not None:
        x = x.astype(cd)
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    key = jax.random.PRNGKey(1)

    def make(fused: bool):
        os.environ["PVA_CONV_FUSED_BWD"] = "1" if fused else "0"

        def loss_fn(p, k):
            if cd is not None:
                p = jax.tree.map(lambda a: a.astype(cd), p)
            out = model.apply(p, x, lengths, train=True, rng=k)
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

        state = tx.init(params)
        out = run(params, state)
        assert np.isfinite(float(out[2])), "non-finite loss"
        return run, state

    run_a, st_a = make(False)
    run_b, st_b = make(True)
    times = {"autodiff": [], "fused": []}
    for _ in range(args.reps):
        for name, fn, st in (("autodiff", run_a, st_a), ("fused", run_b, st_b)):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, st)[2])
            times[name].append((time.perf_counter() - t0) / args.steps * 1e3)
    fr = b * t
    for name in ("autodiff", "fused"):
        med = statistics.median(times[name])
        print(f"{name:>9}: {med:7.3f} ms/step  ({fr / med * 1e3 / 1e6:.2f}M "
              f"frames/s)  all={['%.2f' % v for v in times[name]]}")
    a, p = statistics.median(times["autodiff"]), statistics.median(times["fused"])
    print(f"fused/autodiff: {p / a:.3f}x  ({(a / p - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
