"""Interleaved full-step A/B: MS-TCN unpacked [B,T,64] vs frame-pair packed
[B,T/2,128] activations (PVA_MSTCN_PACK2, ops/conv.py pack2 notes).

Hypothesis: at C=64 every conv in the stage stack runs the 128x128 MXU
quarter-filled (K=64 rows, N=64 output lanes); packing two consecutive
frames into the lane axis doubles both, halving padded-FLOP time on all
~2300 convolution fusions in the step.  Bit-identical math (zeros added to
MXU accumulation, same fmix32 dropout stream) — tests/test_conv_pack2.py.

Usage: python tools/ab_mstcn_pack2.py [--steps 50 --reps 5] [--eval]
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
    ap.add_argument("--eval", action="store_true")
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.ops import conv as conv_mod
    from pytorch_video_action_tpu.train.losses import make_loss_fn
    from pytorch_video_action_tpu.train.optim import make_optimizer

    b, t, n_class = args.b, args.t, 48
    model = build_model("ms_tcn", n_class, defaults=True)
    params0 = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    loss = make_loss_fn("ms_tcn", n_class)
    rng = np.random.default_rng(0)
    cd = jnp.bfloat16  # bench ms_tcn runs bf16 mixed precision
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32)).astype(cd)
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    key = jax.random.PRNGKey(1)

    def make_step(flag):
        conv_mod.PACK2 = flag == "1"  # read at trace time via module attr

        def loss_fn(p, k, train, xx=None):
            p = jax.tree.map(lambda a: a.astype(cd), p)
            out = model.apply(p, x if xx is None else xx, lengths,
                              train=train, rng=k)
            return loss(out, targets)

        if args.eval:
            @jax.jit
            def run(p, s):
                def body(i, acc):
                    # accumulator feeds the input so XLA cannot hoist the
                    # loop-invariant forward (the ab_rnn_split lesson)
                    l = loss_fn(p, jax.random.fold_in(key, i), False,
                                xx=x + (acc * 0).astype(cd))
                    return l.astype(jnp.float32)
                return (p, s, jax.lax.fori_loop(
                    0, args.steps, body, jnp.float32(0)))
        else:
            @jax.jit
            def run(p, s):
                def body(i, carry):
                    pp, ss, _ = carry
                    l, g = jax.value_and_grad(loss_fn)(
                        pp, jax.random.fold_in(key, i), True)
                    u, ss = tx.update(g, ss, pp)
                    return (optax.apply_updates(pp, u), ss,
                            l.astype(jnp.float32))
                return jax.lax.fori_loop(0, args.steps, body,
                                         (p, s, jnp.float32(0)))
        out = run(params0, tx.init(params0))  # compile + warm under flag
        assert np.isfinite(float(out[2]))
        conv_mod.PACK2 = False
        return run

    arms = {f: make_step(f) for f in ("0", "1")}
    states = {f: (params0, tx.init(params0)) for f in arms}
    times = {f: [] for f in arms}
    for _ in range(args.reps):
        for f, run in arms.items():
            p, s = states[f]
            t0 = time.perf_counter()
            p, s, l = run(p, s)
            jax.block_until_ready(l)
            times[f].append((time.perf_counter() - t0) / args.steps * 1e3)
            states[f] = (p, s)
    base = statistics.median(times["0"])
    for f in ("0", "1"):
        med = statistics.median(times[f])
        fps = b * t / (med * 1e-3)
        print(f"pack2={f}: {med:8.3f} ms/step  {fps/1e6:6.2f}M frames/s "
              f"({(base/med-1)*100:+.1f}% vs pack2=0)  "
              f"all={[f'{x:.2f}' for x in times[f]]}")


if __name__ == "__main__":
    main()