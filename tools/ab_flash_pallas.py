"""Interleaved A/B: query-tiled Pallas flash kernels vs the XLA blockwise
scan on the attn bench-regime train step (B=4, T=4096, f32 params).

Motivation: the round-4 step trace decomposes the 9.3 ms attn train step as
5.8 ms of flash scans (fwd 2.16 + bwd 3.65) — ~3x the bf16 matmul floor —
dominated by the [B, H, T, block] f32 score/accumulator HBM traffic the XLA
formulation streams per KV block.  ``ops/flash_pallas.py`` tiles BOTH axes
so score tiles never leave VMEM.

Usage: python tools/ab_flash_pallas.py [--steps 50 --reps 5 --eval]
       [--bq 512 --bkv 512]   (kernel tile sweep via repeated runs)
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
    ap.add_argument("--bq", type=int, default=0, help="pallas q tile override")
    ap.add_argument("--bkv", type=int, default=0, help="pallas kv tile override")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--f32", action="store_true",
                    help="disable bf16 MXU operands in the pallas kernels")
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

    if args.bq:
        fp.DEFAULT_BLOCK_Q = args.bq
    if args.bkv:
        fp.DEFAULT_BLOCK_KV = args.bkv
    if args.f32:
        fp.MXU_BF16 = False

    n_class = 48
    model = build_model("attn", n_class, defaults=True)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    loss = make_loss_fn("attn", n_class)
    rng = np.random.default_rng(0)
    b, t = args.b, args.t
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32))
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    key = jax.random.PRNGKey(1)

    def make(pallas: bool):
        # _use_pallas reads the env at trace time
        os.environ["PVA_FLASH_PALLAS"] = "1" if pallas else "0"

        def loss_fn(p, k, train):
            out = model.apply(p, x, lengths, train=train, rng=k)
            return loss(out, targets)

        if args.eval:
            def loss_x(p, xx, k, train):
                out = model.apply(p, xx, lengths, train=train, rng=k)
                return loss(out, targets)

            @jax.jit
            def run(p, s):
                def body(i, acc):
                    # feed the accumulator back into x so XLA cannot hoist
                    # the loop-invariant forward out of the fori_loop
                    l = loss_x(p, x + acc * 1e-20,
                               jax.random.fold_in(key, i), False)
                    return l.astype(jnp.float32)
                return (p, s,
                        jax.lax.fori_loop(0, args.steps, body, jnp.float32(0)))
            state = None
        else:
            @jax.jit
            def run(p, s):
                def body(i, carry):
                    pp, ss, _ = carry
                    l, g = jax.value_and_grad(loss_fn)(
                        pp, jax.random.fold_in(key, i), True)
                    u, ss = tx.update(g, ss, pp)
                    return (optax.apply_updates(pp, u), ss, l)
                return jax.lax.fori_loop(0, args.steps, body, (p, s, 0.0))
            state = tx.init(params)
        out = run(params, state)  # compile + warm
        assert np.isfinite(float(out[2])), "non-finite loss"
        return run, state

    run_a, st_a = make(False)   # XLA blockwise scan
    run_b, st_b = make(True)    # Pallas tiled kernels

    times = {"xla": [], "pallas": []}
    for _ in range(args.reps):
        for name, fn, st in (("xla", run_a, st_a), ("pallas", run_b, st_b)):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, st)[2])
            times[name].append((time.perf_counter() - t0) / args.steps * 1e3)

    fr = b * t
    for name in ("xla", "pallas"):
        med = statistics.median(times[name])
        print(f"{name:>7}: {med:7.3f} ms/step  ({fr / med * 1e3 / 1e6:.2f}M "
              f"frames/s)  all={['%.2f' % v for v in times[name]]}")
    a, p = statistics.median(times["xla"]), statistics.median(times["pallas"])
    print(f"pallas/xla: {p / a:.3f}x  ({(a / p - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
