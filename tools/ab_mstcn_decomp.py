"""Interleaved decomposition of the ms_tcn train step (tap convs, bf16).

Arms (all chained ``--steps`` times in one jitted fori_loop, interleaved
across ``--reps`` so tunnel drift hits every arm equally):

  eval_fwd   eval-mode forward only (no dropout, no grad)
  train_fwd  train-mode forward only (dropout masks, no grad)
  grad       value_and_grad, no optimizer
  grad_nodrop value_and_grad with dropout off (p=0 via train=False fwd in loss)
  full       value_and_grad + flat-Adam update (the bench config)

The residual ladder isolates: dropout-mask cost (train_fwd - eval_fwd and
grad - grad_nodrop), backward cost (grad - train_fwd), Adam (full - grad).

Usage: python tools/ab_mstcn_decomp.py [--steps 50 --reps 5]
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
    ap.add_argument("--f32", action="store_true", help="skip the bf16 cast")
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

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
    cd = None if args.f32 else jnp.bfloat16

    def cast(p):
        return p if cd is None else jax.tree.map(lambda a: a.astype(cd), p)

    xx = x if cd is None else x.astype(cd)

    def loss_fn(p, k, train):
        out = model.apply(cast(p), xx, lengths, train=train, rng=k)
        return loss(out, targets)

    arms = {}

    def fwd_arm(train):
        @jax.jit
        def run(p, _s):
            def body(i, acc):
                k = jax.random.fold_in(key, i)
                l = loss_fn(p, k, train) + acc * 0e-30
                return l.astype(jnp.float32)

            return (None, None, jax.lax.fori_loop(0, args.steps, body,
                                                  jnp.float32(0)))

        return run, None

    def grad_arm(train, with_adam):
        @jax.jit
        def run(p, s):
            def body(i, carry):
                pp, ss, _ = carry
                l, g = jax.value_and_grad(loss_fn)(
                    pp, jax.random.fold_in(key, i), train)
                if with_adam:
                    u, ss = tx.update(g, ss, pp)
                    pp = optax.apply_updates(pp, u)
                else:
                    # keep params evolving so nothing hoists, but cheaply
                    pp = jax.tree.map(lambda a, ga: a - 0e-30 * ga, pp, g)
                return (pp, ss, l)

            return jax.lax.fori_loop(0, args.steps, body, (p, s, 0.0))

        return run, (tx.init(params) if with_adam else None)

    arms["eval_fwd"] = fwd_arm(False)
    arms["train_fwd"] = fwd_arm(True)
    arms["grad_nodrop"] = grad_arm(False, False)
    arms["grad"] = grad_arm(True, False)
    arms["full"] = grad_arm(True, True)

    for name, (fn, s) in arms.items():
        out = fn(params, s)
        assert np.isfinite(float(out[2])), name

    times = {k: [] for k in arms}
    for _ in range(args.reps):
        for name, (fn, s) in arms.items():
            t0 = time.perf_counter()
            float(fn(params, s)[2])
            times[name].append(time.perf_counter() - t0)
    med = {k: statistics.median(v) * 1000 / args.steps for k, v in times.items()}
    for name in arms:
        print(f"{name:12s}: {med[name]:7.3f} ms/step  "
              f"{b * t / med[name] * 1000:12,.0f} frames/s")
    print(f"\ndropout fwd cost   : {med['train_fwd'] - med['eval_fwd']:7.3f} ms")
    print(f"backward (w/ drop) : {med['grad'] - med['train_fwd']:7.3f} ms")
    print(f"dropout in f+b     : {med['grad'] - med['grad_nodrop']:7.3f} ms")
    print(f"adam               : {med['full'] - med['grad']:7.3f} ms")


if __name__ == "__main__":
    main()
