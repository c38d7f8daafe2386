"""Interleaved full-step A/B: attn bench train step at fused-bwd KV tile
128 vs 256.

Each arm is a SEPARATE jitted chained-step program traced under its own
``fp._FUSED_BKV_OVERRIDE`` (the glue passes the override as a static arg, so
the two closures compile distinct kernels); arms alternate within each rep.

Usage: python tools/ab_attn_fused_bkv.py [--steps 50 --reps 5]
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
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--widths", default="128,256")
    args = ap.parse_args(argv)
    widths = [int(w) for w in args.widths.split(",")]

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import pytorch_video_action_tpu.ops.flash_pallas as fp
    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.train.losses import make_loss_fn
    from pytorch_video_action_tpu.train.optim import make_optimizer

    n_class = 48
    b, t = args.b, args.t
    cd = jnp.bfloat16  # the bench attn config runs bf16 mixed precision
    model = build_model("attn", n_class, defaults=True)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    loss = make_loss_fn("attn", n_class)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32)).astype(cd)
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    key = jax.random.PRNGKey(1)

    def make(width):
        fp._FUSED_BKV_OVERRIDE = width  # read at trace time via the glue

        def loss_fn(p, k):
            p = jax.tree.map(lambda a: a.astype(cd), p)
            out = model.apply(p, x, lengths, train=True, rng=k)
            return loss(out, targets)

        @jax.jit
        def run(p, s):
            def body(i, carry):
                pp, ss, _ = carry
                l, g = jax.value_and_grad(loss_fn)(pp, jax.random.fold_in(key, i))
                u, ss = tx.update(g, ss, pp)
                return (optax.apply_updates(pp, u), ss, l)
            return jax.lax.fori_loop(0, args.steps, body, (p, s, 0.0))

        state = tx.init(params)
        out = run(params, state)  # compile + warm under this override
        assert np.isfinite(float(out[2])), f"non-finite @ {width}"
        return run, state

    runs = {w: make(w) for w in widths}
    times = {w: [] for w in widths}
    for _ in range(args.reps):
        for w, (fn, st) in runs.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, st))
            times[w].append((time.perf_counter() - t0) / args.steps * 1e3)
    base = statistics.median(times[widths[0]])
    for w in widths:
        med = statistics.median(times[w])
        fps = b * t / (med / 1e3)
        print(f"fused_bkv={w:4d}: {med:7.3f} ms/step  {fps / 1e6:6.2f}M "
              f"frames/s ({base / med - 1:+.1%} vs {widths[0]})  "
              f"all={['%.2f' % v for v in times[w]]}")


if __name__ == "__main__":
    main()
