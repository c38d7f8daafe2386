"""Chip roofline probe: big-matmul MXU rate (f32 vs bf16) and the
ms_tcn-tap-shaped small-C dot (HBM-bound regime).

Chained ``y = f(y)`` fori_loops (value-dependent, nothing hoistable) —
the only trustworthy timing on the tunnel (CLAUDE.md).  Used to pin the
speed-of-light denominators in docs/PERF_NOTES.md.

Usage: python tools/mxu_probe.py [--iters 30 --reps 5]
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)

    def timed(fn, *xs):
        # value-fetch (float()) is the only reliable sync on the tunnel —
        # block_until_ready returns early there (measured: 4096^3 "in 3 us")
        assert np.isfinite(float(fn(*xs)))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            assert np.isfinite(float(fn(*xs)))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) / args.iters

    results = {}

    # 1) big square matmul, f32 and bf16: the MXU rate denominator
    for dt in (jnp.float32, jnp.bfloat16):
        n = 4096
        a = jnp.asarray(rng.normal(size=(n, n)), dtype=dt)
        w = jnp.asarray(rng.normal(size=(n, n)) * 0.01, dtype=dt)

        @jax.jit
        def big(a, w):
            def body(i, y):
                # renormalize so values stay finite; the rsqrt is VPU noise
                y = y @ w
                return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6).astype(y.dtype)

            y = jax.lax.fori_loop(0, args.iters, body, a)
            return jnp.mean(y.astype(jnp.float32))

        sec = timed(big, a, w)
        tf = 2 * n**3 / sec / 1e12
        results[f"square4096_{a.dtype.name}"] = tf
        print(f"[{a.dtype.name:9s}] 4096^3 matmul: {sec * 1e3:7.3f} ms/iter  "
              f"{tf:6.1f} TF/s")

    # 2) ms_tcn tap shape [B*T, C] @ [C, C], C=64: HBM-bound regime
    for dt in (jnp.float32, jnp.bfloat16):
        m, c = 8 * 4096, 64
        a = jnp.asarray(rng.normal(size=(m, c)), dtype=dt)
        w = jnp.asarray(rng.normal(size=(c, c)) * 0.1, dtype=dt)

        @jax.jit
        def tap(a, w):
            def body(i, y):
                y = y @ w
                return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6).astype(y.dtype)

            y = jax.lax.fori_loop(0, args.iters, body, a)
            return jnp.mean(y.astype(jnp.float32))

        sec = timed(tap, a, w)
        gb = 2 * m * c * a.dtype.itemsize / 1e9  # read + write per iter
        print(f"[{a.dtype.name:9s}] [{m},{c}]@[{c},{c}]: {sec * 1e6:7.1f} us/iter  "
              f"{2 * m * c * c / sec / 1e12:5.2f} TF/s  "
              f"{gb / sec:6.1f} GB/s effective")

    # 3) attention-shaped dense dot [T,T]@[T,128] f32
    t_ = 4096
    a = jnp.asarray(rng.normal(size=(t_, t_)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(t_, 128)) * 0.01, dtype=jnp.float32)

    @jax.jit
    def att(a, w):
        def body(i, y):
            s = a @ y  # [T,T]@[T,128]
            return s * jax.lax.rsqrt(jnp.mean(s * s) + 1e-6)

        y = jax.lax.fori_loop(0, args.iters, body, w)
        return jnp.mean(y.astype(jnp.float32))

    sec = timed(att, a, w)
    print(f"[float32  ] [{t_},{t_}]@[{t_},128]: {sec * 1e3:7.3f} ms/iter  "
          f"{2 * t_ * t_ * 128 / sec / 1e12:6.1f} TF/s")

    # 4) VPU transcendental rate: sigmoid over the bigru gate volume
    #    [1024, 64, 768] — the denominator of the flagship's
    #    "VPU-transcendental-bound" speed-of-light argument.
    for dt in (jnp.float32, jnp.bfloat16):
        g = jnp.asarray(rng.normal(size=(1024, 64, 768)), dtype=dt)

        @jax.jit
        def sig(g):
            def body(i, y):
                # sigmoid keeps values in (0,1); recenter so it never
                # saturates to a constant the compiler could exploit
                return jax.nn.sigmoid(y * 4.0 - 2.0)

            y = jax.lax.fori_loop(0, args.iters, body, g)
            return jnp.mean(y.astype(jnp.float32))

        sec = timed(sig, g)
        n = g.size
        print(f"[{g.dtype.name:9s}] sigmoid [1024,64,768]: {sec * 1e3:7.3f} ms/iter  "
              f"{n / sec / 1e9:6.1f} Gelem/s  "
              f"{2 * n * g.dtype.itemsize / sec / 1e9:6.1f} GB/s r+w")

    # 5) HBM stream: y = y*a + b over 256 MB (read + write, no reuse)
    big = jnp.asarray(rng.normal(size=(64 * 1024 * 1024,)), dtype=jnp.float32)

    @jax.jit
    def stream(y):
        def body(i, y):
            return y * 0.999 + 1e-6

        y = jax.lax.fori_loop(0, args.iters, body, y)
        return jnp.mean(y)

    sec = timed(stream, big)
    gb = 2 * big.size * 4 / 1e9
    print(f"[float32  ] stream {gb / 2 * 1000:4.0f} MB r+w: {sec * 1e3:7.3f} ms/iter  "
          f"{gb / sec:6.1f} GB/s")


if __name__ == "__main__":
    main()
