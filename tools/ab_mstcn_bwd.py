"""Interleaved A/B over ms_tcn train-step backward variants (tap convs, bf16).

Arms = (remat policy) x (dropout mask stream):
  none/word    round-3 baseline (XLA saves linearization points, 1 hash
               word per mask element)
  none/packed  keep_mask8: 4 Bernoulli bytes per hash word
  layer/word   jax.checkpoint per dilated residual layer (backward
               recomputes each layer fwd from its input; masks regenerate
               deterministically from the counter stream)
  layer/packed both
  stage/packed jax.checkpoint per stage

Motivation (tools/ab_mstcn_decomp.py): backward = 4.19 ms vs 0.68 ms fwd
(~6x, vs ~2x in FLOPs) — saved-intermediate HBM streams; masks = 1.3-1.75
ms of the 6.3 ms step.

Usage: python tools/ab_mstcn_bwd.py [--steps 50 --reps 5]
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
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import pytorch_video_action_tpu.models.mstcn as mstcn_mod
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
    xx = x.astype(jnp.bfloat16)
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    key = jax.random.PRNGKey(1)

    def make(remat, packed):
        # trace-time module flags; restore after tracing
        mstcn_mod.REMAT = remat
        conv_mod.PACKED_MASKS = packed

        def loss_fn(p, k):
            p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
            out = model.apply(p, xx, lengths, train=True, rng=k)
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
        out = run(params, s0)  # trace + compile with the flags active
        assert np.isfinite(float(out[2])), (remat, packed)
        mstcn_mod.REMAT = "none"
        conv_mod.PACKED_MASKS = True
        return run, s0

    arms = {
        "none/word": make("none", False),
        "none/packed": make("none", True),
        "layer/word": make("layer", False),
        "layer/packed": make("layer", True),
        "stage/packed": make("stage", True),
    }
    times = {k: [] for k in arms}
    for _ in range(args.reps):
        for name, (fn, s) in arms.items():
            t0 = time.perf_counter()
            float(fn(params, s)[2])
            times[name].append(time.perf_counter() - t0)
    for name in arms:
        med = statistics.median(times[name]) * 1000 / args.steps
        print(f"{name:12s}: {med:7.3f} ms/step  "
              f"{b * t / med * 1000:12,.0f} frames/s")


if __name__ == "__main__":
    main()
