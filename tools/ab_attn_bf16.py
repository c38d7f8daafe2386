"""Interleaved A/B: attn train step f32 vs bf16 mixed precision.

VERDICT r3 item 4: bench.py hard-excluded attn from bf16 ("flash softmax
accumulators are exactness-sensitive") WITHOUT a measurement — the exact
assumption-instead-of-A/B pattern that mispriced ms_tcn bf16 in round 1.
ops/flash.py now keeps the online-softmax state (m, l, acc) f32 regardless
of input dtype, so bf16 only touches the QK/PV matmuls + the surrounding
model body; this measures whether that pays on the B=4, T=4096 step.

Optionally sweeps PVA_FLASH_BLOCK_BWD (--bwd_blocks) in the same interleaved
run: the backward recompute holds a different working set than the forward
(dout/delta live, dk/dv emitted), so its optimum may differ from the fwd 64.

Usage: python tools/ab_attn_bf16.py [--steps 50 --reps 5 --bwd_blocks 0,128]
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
    ap.add_argument("--bwd_blocks", type=str, default="0",
                    help="comma list; 0 = same as fwd block")
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.ops import flash as flash_mod
    from pytorch_video_action_tpu.train.losses import make_loss_fn
    from pytorch_video_action_tpu.train.optim import make_optimizer

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
    orig_bwd = flash_mod.BWD_BLOCK

    def make(dtype, bwd_block):
        cd = None if dtype == "f32" else jnp.bfloat16
        flash_mod.BWD_BLOCK = bwd_block or None  # trace-time constant

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
        assert np.isfinite(float(out[2])), (dtype, bwd_block)
        flash_mod.BWD_BLOCK = orig_bwd
        return run, s0

    arms = {}
    for bwd in (int(v) for v in args.bwd_blocks.split(",")):
        for dt in ("f32", "bf16"):
            arms[f"{dt}/bwd{bwd or 'fwd'}"] = make(dt, bwd)

    times = {k: [] for k in arms}
    for _ in range(args.reps):
        for name, (fn, s) in arms.items():
            t0 = time.perf_counter()
            float(fn(params, s)[2])
            times[name].append(time.perf_counter() - t0)
    for name in arms:
        med = statistics.median(times[name]) * 1000 / args.steps
        fps = args.b * args.t / (med / 1000)
        print(f"{name:>14}: {med:7.2f} ms/step  {fps:,.0f} frames/s")


if __name__ == "__main__":
    main()
