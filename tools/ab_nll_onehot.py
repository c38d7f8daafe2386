"""Interleaved full-step A/B: NLL target pick as take_along_axis GATHER vs
one-hot masked SUM (the committed form), on the bigru bench train step.

The gather fusion showed up in the round-4 trace at 0.54 ms/step for 1 MB
touched (train/losses.py:27 via jvp(take_along_axis)/gather) — row gathers
run near-serially on TPU.  Each arm traces its own step with its own loss
pick; arms alternate within reps.

Usage: python tools/ab_nll_onehot.py [--model bigru --steps 50 --reps 5]
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
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pytorch_video_action_tpu import TARGET_PAD
    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.train.optim import make_optimizer

    shapes = {"bigru": (64, 1024), "bilstm": (64, 1024), "attn": (4, 4096),
              "ms_tcn": (8, 4096)}
    b, t = shapes[args.model]
    n_class = 48
    model = build_model(args.model, n_class, defaults=True)
    params0 = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    rng = np.random.default_rng(0)
    cd = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32)).astype(cd)
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    key = jax.random.PRNGKey(1)

    def pick_gather(lp, safe_t):
        return jnp.take_along_axis(lp, safe_t[:, None], axis=1)[:, 0]

    def pick_onehot(lp, safe_t):
        hot = (jnp.arange(lp.shape[-1], dtype=safe_t.dtype)[None, :]
               == safe_t[:, None])
        return jnp.where(hot, lp, 0.0).sum(axis=-1)

    def make_step(pick):
        def nll(lp, tg):
            lp = lp.reshape(-1, lp.shape[-1])
            tg = tg.reshape(-1)
            valid = tg != TARGET_PAD
            safe_t = jnp.where(valid, tg, 0)
            p = jnp.where(valid, pick(lp, safe_t), 0.0)
            return -p.sum() / jnp.maximum(valid.sum(), 1)

        def loss_fn(p, k):
            p = jax.tree.map(lambda a: a.astype(cd), p)
            out = model.apply(p, x, lengths, train=True, rng=k)
            if args.model in ("ms_tcn", "mstcn"):
                out = jax.nn.log_softmax(out, axis=-1)
            return nll(out, targets)

        @jax.jit
        def run(p, s):
            def body(i, carry):
                pp, ss, _ = carry
                l, g = jax.value_and_grad(loss_fn)(
                    pp, jax.random.fold_in(key, i))
                u, ss = tx.update(g, ss, pp)
                return (optax.apply_updates(pp, u), ss, l.astype(jnp.float32))
            return jax.lax.fori_loop(0, args.steps, body,
                                     (p, s, jnp.float32(0)))
        out = run(params0, tx.init(params0))
        assert np.isfinite(float(out[2]))
        return run

    arms = {"gather": make_step(pick_gather), "onehot": make_step(pick_onehot)}
    states = {n: (params0, tx.init(params0)) for n in arms}
    times = {n: [] for n in arms}
    for _ in range(args.reps):
        for n, run in arms.items():
            p, s = states[n]
            t0 = time.perf_counter()
            p, s, l = run(p, s)
            jax.block_until_ready(l)
            times[n].append((time.perf_counter() - t0) / args.steps * 1e3)
            states[n] = (p, s)
    base = statistics.median(times["gather"])
    for n in ("gather", "onehot"):
        med = statistics.median(times[n])
        fps = b * t / (med * 1e-3)
        print(f"{n:>7}: {med:8.3f} ms/step  {fps/1e6:6.2f}M frames/s "
              f"({(base/med-1)*100:+.1f}% vs gather)  "
              f"all={[f'{x:.2f}' for x in times[n]]}")


if __name__ == "__main__":
    main()
