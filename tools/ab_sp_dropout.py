"""Interleaved A/B: SP MS-TCN train step with counter-hash dropout masks vs
threefry bernoulli (VERDICT r2 item 3).

The single-chip XLA conv path measured +37% step time from per-layer
threefry draws (docs/PERF_NOTES.md, commit e9a99c6); ``parallel/sp.py`` now
rides the same ``ops/hashmask.py`` stream.  On one chip the SP program runs
on a 1x1 mesh — the halo ppermutes are no-ops but the dropout cost per
element is identical to the multi-chip program, so the A/B isolates exactly
the mask-generation cost the fleet would pay.

Interleaved A/B/A/B (cross-process runs on the shared chip drift ~10 ms,
CLAUDE.md): both variants compiled first, then alternating timed runs,
medians reported.

Usage: python tools/ab_sp_dropout.py  [--steps 10 --reps 5]
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
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pytorch_video_action_tpu.models import mstcn
    from pytorch_video_action_tpu.parallel import make_mesh
    from pytorch_video_action_tpu.parallel.sp import mstcn_forward_sp
    from pytorch_video_action_tpu.train.losses import cross_entropy_loss

    n_class = 48
    cfg = mstcn.MSTCNConfig(n_class=n_class)
    params = mstcn.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=1, seq=1)
    rng = np.random.default_rng(0)
    b, t = args.b, args.t
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32))
    lengths = jnp.asarray(np.full((b,), t, np.int32))
    targets = jnp.asarray(rng.integers(0, n_class, size=(b, t)))
    tx = optax.adam(1e-3)
    key = jax.random.PRNGKey(1)

    def make_step(use_hash: bool):
        # the flag is read at trace time inside parallel/sp.py via
        # ops.conv.HASH_DROPOUT; patch it before tracing each variant
        import pytorch_video_action_tpu.ops.conv as conv_mod

        conv_mod.HASH_DROPOUT = use_hash

        def loss_fn(p, k):
            logits = mstcn_forward_sp(p, cfg, x, lengths, mesh,
                                      train=True, rng=k)
            return cross_entropy_loss(logits, targets)

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

    run_hash, s_hash = make_step(True)
    run_tf, s_tf = make_step(False)

    times = {"hash": [], "threefry": []}
    for _ in range(args.reps):
        for name, fn, s in (("hash", run_hash, s_hash),
                            ("threefry", run_tf, s_tf)):
            t0 = time.perf_counter()
            float(fn(params, s)[2])
            times[name].append(time.perf_counter() - t0)
    frames = b * t * args.steps
    med_h = statistics.median(times["hash"])
    med_t = statistics.median(times["threefry"])
    print(f"hash:     {med_h * 1000 / args.steps:7.2f} ms/step  "
          f"{frames / med_h:12,.0f} frames/s   {times['hash']}")
    print(f"threefry: {med_t * 1000 / args.steps:7.2f} ms/step  "
          f"{frames / med_t:12,.0f} frames/s   {times['threefry']}")
    print(f"speedup (threefry/hash): {med_t / med_h:.3f}x")


if __name__ == "__main__":
    main()
