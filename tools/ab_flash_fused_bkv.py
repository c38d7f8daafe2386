"""Interleaved A/B: fused flash-backward KV tile width (128 vs 256 vs ...).

The fused single-pass backward picks its KV tile from a VMEM budget that
conservatively counts q/dout as f32; under MXU_BF16 they are demoted to
bf16, so a wider tile (fewer grid steps, fatter dots) may actually fit.
This isolates flash_bwd_pallas (lse/delta from one real forward) in a
chained fori_loop and times each candidate width interleaved.

Usage: python tools/ab_flash_fused_bkv.py [--widths 128,256] [--iters 50]
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
    ap.add_argument("--widths", default="128,256")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=4)
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--d", type=int, default=100)
    ap.add_argument("--rate", type=float, default=0.3)
    args = ap.parse_args(argv)
    widths = [int(w) for w in args.widths.split(",")]

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import pytorch_video_action_tpu.ops.flash_pallas as fp

    rng = np.random.default_rng(0)
    bh = args.b * args.h
    d_pad = (args.d + 127) // 128 * 128
    shape = (bh, args.t, d_pad)
    q = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    mask = jnp.ones((args.b, args.t), jnp.float32)
    seed = jnp.asarray([7], jnp.uint32)
    keep = 1.0 - args.rate

    out, lse = fp.flash_fwd_pallas(q, k, v, mask, seed, num_heads=args.h,
                                   keep=keep)
    dout = out * 1e-2
    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32), -1)

    def make(width):
        @jax.jit
        def run(q0):
            def body(i, qq):
                dq, dk, dv = fp.flash_bwd_pallas(
                    qq, k, v, mask, seed, lse, delta, dout,
                    num_heads=args.h, keep=keep, fused_bkv=width,
                )
                return qq * 0.999 + dq * 1e-3 + dk * 1e-6 + dv * 1e-6
            return jax.lax.fori_loop(0, args.iters, body, q0)

        out = run(q)
        assert np.isfinite(np.asarray(jnp.sum(out))), f"non-finite @ {width}"
        return run

    runs = {w: make(w) for w in widths}
    times = {w: [] for w in widths}
    for _ in range(args.reps):
        for w, fn in runs.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q))
            times[w].append((time.perf_counter() - t0) / args.iters * 1e3)
    base = statistics.median(times[widths[0]])
    for w in widths:
        med = statistics.median(times[w])
        print(f"bkv={w:4d}: {med:7.3f} ms/iter ({base / med - 1:+.1%} vs "
              f"{widths[0]})  all={['%.2f' % x for x in times[w]]}")


if __name__ == "__main__":
    main()
