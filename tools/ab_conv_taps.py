"""Interleaved A/B: ms_tcn production train step with tap-formulated convs
(shift + matmul, ``ops/conv.py CONV_TAPS``) vs ``lax.conv_general_dilated``.

Exact bench configuration (bench.py ms_tcn: B=8, T=4096, dropout 0.5 hash
masks, flat Adam, masked CE loss) so the result transfers 1:1 to
BENCH_r*.json.  Interleaved A/B/A/B, medians reported.

Usage: python tools/ab_conv_taps.py [--steps 10 --reps 5] [--eval]
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
    ap.add_argument("--eval", action="store_true",
                    help="A/B the eval forward instead of the train step")
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import pytorch_video_action_tpu.ops.conv as conv_mod
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

    def make(variant_taps: bool):
        conv_mod.CONV_TAPS = variant_taps

        if args.eval:
            # force the XLA (non-fused-kernel) eval path so the A/B isolates
            # the conv formulation, not the Pallas stage kernel
            os.environ["PVA_USE_PALLAS"] = "0"

            @jax.jit
            def run(p, _s):
                def body(i, acc):
                    l2 = lengths + jnp.isnan(acc).astype(jnp.int32)
                    out = model.apply(p, x, l2, train=False)
                    return acc + out.mean().astype(jnp.float32)

                return (None, None, jax.lax.fori_loop(0, args.steps, body,
                                                      jnp.float32(0)))

            s0 = None
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

                return jax.lax.fori_loop(0, args.steps, body, (p, s, 0.0))

            s0 = tx.init(params)
        out = run(params, s0)  # compile
        assert np.isfinite(float(out[2]))
        return run, s0

    run_taps, s_taps = make(True)
    run_conv, s_conv = make(False)

    times = {"taps": [], "conv": []}
    for _ in range(args.reps):
        for name, fn, s in (("taps", run_taps, s_taps),
                            ("conv", run_conv, s_conv)):
            t0 = time.perf_counter()
            float(fn(params, s)[2])
            times[name].append(time.perf_counter() - t0)
    frames = b * t * args.steps
    for name in ("taps", "conv"):
        med = statistics.median(times[name])
        print(f"{name}: {med * 1000 / args.steps:7.2f} ms/step  "
              f"{frames / med:12,.0f} frames/s   {times[name]}")
    print(f"speedup (conv/taps): "
          f"{statistics.median(times['conv']) / statistics.median(times['taps']):.3f}x")


if __name__ == "__main__":
    main()
