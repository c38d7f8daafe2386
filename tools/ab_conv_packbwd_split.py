"""Split the packed-backward loss: which half (dW packing vs dx packing)
costs?  Arms monkeypatch conv._tap3_packed with partial variants:

  nopack   autodiff per-tap backward
  pack     both packed (ops/conv.py default candidate)
  dw_only  dW via one [3C,BT]@[BT,C'] dot, dx per-tap (3 small dots)
  dx_only  dW per-tap, dx via one [BT,C']@[C',3C] dot + shift-adds

Usage: python tools/ab_conv_packbwd_split.py [--steps 50 --reps 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from functools import partial

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
    from pytorch_video_action_tpu.ops.conv import (
        _shift_left, _shift_right, _tap3_value,
    )
    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.train.losses import make_loss_fn
    from pytorch_video_action_tpu.train.optim import make_optimizer

    def make_variant(pack_dw, pack_dx):
        @partial(jax.custom_vjp, nondiff_argnums=(0,))
        def f(d, w, b, x):
            return _tap3_value(d, w, b, x)

        def fwd(d, w, b, x):
            return _tap3_value(d, w, b, x), (w, x)

        def bwd(d, res, g):
            w, x = res
            bsz, t, c = x.shape
            cp = g.shape[-1]
            gf = g.reshape(bsz * t, cp)
            db = gf.sum(0).astype(g.dtype)
            if d >= t:
                dw1 = x.reshape(bsz * t, c).T @ gf
                zero = jnp.zeros_like(dw1)
                return jnp.stack([zero, dw1, zero]), db, g @ w[1].T
            if pack_dw:
                xt = jnp.concatenate(
                    [_shift_right(x, d), x, _shift_left(x, d)], axis=-1)
                dw = (xt.reshape(bsz * t, 3 * c).T @ gf).reshape(3, c, cp)
            else:
                xf = x.reshape(bsz * t, c)
                dw = jnp.stack([
                    _shift_right(x, d).reshape(bsz * t, c).T @ gf,
                    xf.T @ gf,
                    _shift_left(x, d).reshape(bsz * t, c).T @ gf,
                ])
            if pack_dx:
                dtap = (gf @ w.reshape(3 * c, cp).T).reshape(bsz, t, 3, c)
                dx = (_shift_left(dtap[:, :, 0], d) + dtap[:, :, 1]
                      + _shift_right(dtap[:, :, 2], d))
            else:
                dx = (_shift_left(g @ w[0].T, d) + g @ w[1].T
                      + _shift_right(g @ w[2].T, d))
            return dw, db, dx

        f.defvjp(fwd, bwd)
        return f

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
    orig = conv_mod._tap3_packed

    def make(variant):
        if variant == "nopack":
            conv_mod.PACK_BWD = False
        else:
            conv_mod.PACK_BWD = True
            conv_mod._tap3_packed = make_variant(
                pack_dw=variant in ("pack", "dw_only"),
                pack_dx=variant in ("pack", "dx_only"))

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
        out = run(params, s0)
        assert np.isfinite(float(out[2])), variant
        conv_mod.PACK_BWD = True
        conv_mod._tap3_packed = orig
        return run, s0, out[2]

    arms = {v: make(v) for v in ("nopack", "pack", "dw_only", "dx_only")}
    print("chained-loss:", {k: f"{float(v[2]):.6f}" for k, v in arms.items()})
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
