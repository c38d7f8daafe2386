"""Interleaved A/B: XLA glue vs in-kernel layer boundaries in the fused
GRU stack.

The glue form (``PVA_RNN_FUSED_BOUNDARY=0``) materializes each layer
boundary as ``concat([ysf, ysb]) * mask`` plus a hash-dropout where pass
(round-5 trace: ~0.6 ms of the 5.6 ms bigru step incl. VJPs); the fused
form consumes the previous layer's raw halves and runs the boundary ops
inside the next layer's kernel with the identical fmix32 stream
(``ops/rnn_fused_pallas.py`` FUSED_BOUNDARY).  Values/grads bit-identical
(tests/test_rnn_fused.py::test_fused_boundary_matches_glue); this
measures time only.

Usage: python tools/ab_rnn_fused_boundary.py [--model bigru]
       [--steps 50 --reps 5]
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
    ap.add_argument("--model", default="bigru")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--b", type=int, default=0, help="0 = bench shape")
    ap.add_argument("--t", type=int, default=0)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import pytorch_video_action_tpu.ops.rnn_fused_pallas as F
    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.train.losses import make_loss_fn
    from pytorch_video_action_tpu.train.optim import make_optimizer

    # bench.py regimes: (B, T, cast-to-bf16)
    bench_shapes = {
        "bigru": (64, 1024, True), "bilstm": (64, 1024, True),
        "attn": (4, 4096, True),
    }
    n_class = 48
    model = build_model(args.model, n_class, defaults=True)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    loss = make_loss_fn(args.model, n_class)
    rng = np.random.default_rng(0)
    b, t, bf16 = bench_shapes[args.model]
    b, t = (args.b or b), (args.t or t)
    cd = None if (args.f32 or not bf16) else jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32))
    if cd is not None:
        x = x.astype(cd)
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    key = jax.random.PRNGKey(1)

    def make(fused_boundary):
        F.FUSED_BOUNDARY = fused_boundary

        def cast(p):
            return jax.tree.map(lambda a: a.astype(cd), p) if cd else p

        def loss_fn(p, k):
            out = model.apply(cast(p), x, lengths, train=True, rng=k)
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
        out = run(params, s0)  # trace/compile with the arm's flag live
        assert np.isfinite(float(out[2])), fused_boundary
        F.FUSED_BOUNDARY = os.environ.get("PVA_RNN_FUSED_BOUNDARY", "1") == "1"
        return run, s0

    arms = {"glue_bnd  ": make(False), "fused_bnd": make(True)}
    times = {k: [] for k in arms}
    for _ in range(args.reps):
        for name, (fn, s) in arms.items():
            t0 = time.perf_counter()
            float(fn(params, s)[2])
            times[name].append(time.perf_counter() - t0)
    for name in arms:
        med = statistics.median(times[name]) * 1000 / args.steps
        print(f"{args.model}/{name:10s}: {med:7.3f} ms/step  "
              f"{b * t / med * 1000:12,.0f} frames/s")


if __name__ == "__main__":
    main()
