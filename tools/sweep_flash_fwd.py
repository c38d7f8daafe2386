"""Interleaved sweep of the Pallas flash-attention FORWARD tile sizes
(bq, bkv) on the attn bench train step.

The (512, 1024) defaults were chosen by the round-3 sweep BEFORE the
round-4 fused single-pass backward landed; with the backward now off the
fwd kernel's critical path the optimum may have moved.  Arms wrap
``flash_fwd_pallas``/``flash_bwd_pallas`` in ``functools.partial`` with
explicit bq/bkv (the module defaults bind at def time, so monkeypatching
the constants would be a silent no-op).

Usage: python tools/sweep_flash_fwd.py [--steps 50 --reps 3]
       [--tiles 512x1024,256x1024,...]
"""

from __future__ import annotations

import argparse
import functools
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiles", default="512x1024,256x1024,512x512,"
                    "1024x1024,256x512")
    ap.add_argument("--eval", action="store_true")
    args = ap.parse_args(argv)

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
    b, t = 4, 4096
    model = build_model("attn", n_class, defaults=True)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    loss = make_loss_fn("attn", n_class)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(b, t, 400)).astype(np.float32)).astype(jnp.bfloat16)
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    key = jax.random.PRNGKey(1)
    orig_fwd, orig_bwd = fp.flash_fwd_pallas, fp.flash_bwd_pallas

    def make(bq, bkv):
        fp.flash_fwd_pallas = functools.partial(orig_fwd, bq=bq, bkv=bkv)
        fp.flash_bwd_pallas = functools.partial(orig_bwd, bq=bq, bkv=bkv)
        try:
            if args.eval:
                @jax.jit
                def run(p, _s):
                    def body(i, acc):
                        out = model.apply(
                            p, x + (acc * 0).astype(x.dtype), lengths,
                            train=False)
                        return acc + out.reshape(-1)[i]

                    return None, None, jax.lax.fori_loop(
                        0, args.steps, body, 0.0)
            else:
                def loss_fn(p, k):
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

                    return jax.lax.fori_loop(0, args.steps, body,
                                             (p, s, 0.0))

            s0 = tx.init(params)
            out = run(params, s0)
            assert np.isfinite(float(out[2])), (bq, bkv)
        finally:
            fp.flash_fwd_pallas, fp.flash_bwd_pallas = orig_fwd, orig_bwd
        return run, s0

    tiles = [tuple(int(v) for v in s.split("x"))
             for s in args.tiles.split(",")]
    arms = {f"{bq}x{bkv}": make(bq, bkv) for bq, bkv in tiles}
    times = {k: [] for k in arms}
    for _ in range(args.reps):
        for name, (fn, s) in arms.items():
            t0 = time.perf_counter()
            float(fn(params, s)[2])
            times[name].append(time.perf_counter() - t0)
    for name in arms:
        med = statistics.median(times[name]) * 1000 / args.steps
        print(f"attn/fwd {name:10s}: {med:7.3f} ms/step  "
              f"{b * t / med * 1000:12,.0f} frames/s")


if __name__ == "__main__":
    main()
