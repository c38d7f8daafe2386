"""Interleaved A/B: packed-backward tap conv (PVA_CONV_PACK_BWD) on/off.

Arms (bf16 bench config, fori_loop-chained full train steps):
  nopack  autodiff of the per-tap form (round-3 production backward)
  pack    _tap3_packed custom VJP — one [3C,B*T]@[B*T,C'] dW dot + one
          [B*T,C']@[C',3C] dx dot per dilated conv (VERDICT r3 item 2)

Usage: python tools/ab_conv_packbwd.py [--steps 50 --reps 5] [--f32]
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
    ap.add_argument("--f32", action="store_true")
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
    cd = jnp.float32 if args.f32 else jnp.bfloat16
    xx = x.astype(cd)
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    key = jax.random.PRNGKey(1)

    def make(pack):
        conv_mod.PACK_BWD = pack

        def loss_fn(p, k):
            p = jax.tree.map(lambda a: a.astype(cd), p)
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
        out = run(params, s0)  # trace + compile with the flag active
        assert np.isfinite(float(out[2])), pack
        conv_mod.PACK_BWD = True
        return run, s0, out[2]

    arms = {"nopack": make(False), "pack": make(True)}
    la, lb = (float(arms[k][2]) for k in ("nopack", "pack"))
    print(f"chained-loss check: nopack {la:.6f} vs pack {lb:.6f}")
    times = {k: [] for k in arms}
    for _ in range(args.reps):
        for name, (fn, s, _) in arms.items():
            t0 = time.perf_counter()
            float(fn(params, s)[2])
            times[name].append(time.perf_counter() - t0)
    for name in arms:
        med = statistics.median(times[name]) * 1000 / args.steps
        print(f"{name:8s}: {med:7.3f} ms/step  "
              f"{b * t / med * 1000:12,.0f} frames/s")


if __name__ == "__main__":
    main()
