"""Interleaved A/B over flash-attention KV block sizes on the attn train step.

Motivation: the online-softmax scan rescales its [B, H, T, d] accumulator
every block, so at T=4096 with block=512 the carry alone streams ~8x more
than at block=4096; conversely larger blocks materialize larger [T, c]
score tiles.  DEFAULT_BLOCK=512 was chosen under the dispatch-polluted
roofline (docs/PERF_NOTES.md round-3 correction) — re-measure.

Usage: python tools/ab_flash_block.py [--steps 50 --reps 5]
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
    ap.add_argument("--blocks", type=str, default="256,512,1024,2048,4096")
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import pytorch_video_action_tpu.models.attention as attn_mod
    from pytorch_video_action_tpu.models import build_model
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

    def make(block):
        attn_mod.BLOCKWISE_BLOCK = block  # trace-time constant

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
        out = run(params, s0)
        assert np.isfinite(float(out[2])), block
        attn_mod.BLOCKWISE_BLOCK = 512
        return run, s0

    arms = {blk: make(int(blk)) for blk in args.blocks.split(",")}
    times = {k: [] for k in arms}
    for _ in range(args.reps):
        for name, (fn, s) in arms.items():
            t0 = time.perf_counter()
            float(fn(params, s)[2])
            times[name].append(time.perf_counter() - t0)
    for name in arms:
        med = statistics.median(times[name]) * 1000 / args.steps
        print(f"block {name:>5s}: {med:7.3f} ms/step  "
              f"{b * t / med * 1000:12,.0f} frames/s")


if __name__ == "__main__":
    main()
