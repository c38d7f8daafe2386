"""Flash-attention microbench: XLA blockwise scan vs Pallas tiled kernels,
fwd-only and fwd+bwd, isolated from the rest of the attn model (the train
step carries ~3.5 ms of GRU/glue that dilutes whole-step A/Bs).

Chained fori_loop (dispatch-amortized); the loop feeds each iteration's
output back into q so XLA cannot hoist the attention out of the loop.

Usage: python tools/ab_flash_micro.py [--iters 50 --reps 5 --bq 512 ...]
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
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=4)
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--d", type=int, default=100)
    ap.add_argument("--rate", type=float, default=0.3)
    ap.add_argument("--bq", type=int, default=0)
    ap.add_argument("--bkv", type=int, default=0)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--fwd_only", action="store_true")
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import pytorch_video_action_tpu.ops.flash as flash
    import pytorch_video_action_tpu.ops.flash_pallas as fp

    if args.bq:
        fp.DEFAULT_BLOCK_Q = args.bq
    if args.bkv:
        fp.DEFAULT_BLOCK_KV = args.bkv
    if args.f32:
        fp.MXU_BF16 = False

    rng = np.random.default_rng(0)
    shape = (args.b, args.h, args.t, args.d)
    q = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    mask = jnp.ones((args.b, args.t), dtype=bool)
    key = jax.random.PRNGKey(1)
    rate = args.rate

    def make(pallas: bool):
        os.environ["PVA_FLASH_PALLAS"] = "1" if pallas else "0"

        def att(qq, i):
            rk = jax.random.fold_in(key, i) if rate > 0 else None
            return flash.flash_self_attention(qq, k, v, mask, rate, rk, 64)

        if args.fwd_only:
            @jax.jit
            def run(q0):
                def body(i, qq):
                    o = att(qq, i)
                    return qq * 0.999 + o * 1e-3  # feed back, keep scale
                return jax.lax.fori_loop(0, args.iters, body, q0)
        else:
            @jax.jit
            def run(q0):
                def body(i, qq):
                    # full (dq, dk, dv) like the train step — closing over
                    # k/v would skip the dk/dv computation entirely
                    rk = jax.random.fold_in(key, i) if rate > 0 else None
                    o, vjp = jax.vjp(
                        lambda a, b, c: flash.flash_self_attention(
                            a, b, c, mask, rate, rk, 64),
                        qq, k, v,
                    )
                    dq, dk, dv = vjp(o * 1e-3)
                    return qq * 0.999 + dq + dk * 1e-6 + dv * 1e-6
                return jax.lax.fori_loop(0, args.iters, body, q0)
        out = run(q)
        assert np.isfinite(np.asarray(jnp.sum(out))), "non-finite"
        return run

    run_a = make(False)
    run_b = make(True)
    times = {"xla": [], "pallas": []}
    for _ in range(args.reps):
        for name, fn in (("xla", run_a), ("pallas", run_b)):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q))
            times[name].append((time.perf_counter() - t0) / args.iters * 1e3)
    for name in ("xla", "pallas"):
        med = statistics.median(times[name])
        print(f"{name:>7}: {med:7.3f} ms/iter  "
              f"all={['%.2f' % v for v in times[name]]}")
    a, p = statistics.median(times["xla"]), statistics.median(times["pallas"])
    print(f"pallas/xla: {p / a:.3f}x  ({(a / p - 1) * 100:+.1f}%)  "
          f"[{'fwd' if args.fwd_only else 'fwd+bwd'}, rate={rate}, "
          f"bq={fp.DEFAULT_BLOCK_Q}, bkv={fp.DEFAULT_BLOCK_KV}, "
          f"mxu_bf16={fp.MXU_BF16}]")


if __name__ == "__main__":
    main()
