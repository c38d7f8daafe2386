"""Decompose the attn train step (bench config B=4, T=4096, f32, flash
attention, hash dropout 0.3, flat Adam): where do the 25.8 ms go?

Variants (interleaved, medians over chained fori_loop reps — the only
timing methodology that is trustworthy on the tunnel, CLAUDE.md):

- ``full``      exact bench step: MHA(flash) -> BiGRU -> linear, NLL, Adam
- ``no_gru``    GRU replaced by a slice ``h[..., :256]`` (isolates the
                attention + projection cost)
- ``no_attn``   MHA replaced by identity (isolates the GRU + projection cost)
- ``neither``   both replaced (projection/loss/Adam floor)

The pairwise deltas attribute the step: attention ~= full - no_attn,
GRU ~= full - no_gru (up to XLA overlap).  Usage::

    python tools/ab_attn_decomp.py [--steps 10 --reps 5]
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
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--t", type=int, default=4096)
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.models.attention import mha_self_attention
    from pytorch_video_action_tpu.models.common import (
        linear, log_softmax, split_rng,
    )
    from pytorch_video_action_tpu.ops.masking import length_mask
    from pytorch_video_action_tpu.ops.rnn import gru_apply
    from pytorch_video_action_tpu.train.losses import make_loss_fn
    from pytorch_video_action_tpu.train.optim import make_optimizer

    n_class = 48
    model = build_model("attn", n_class, defaults=True)
    cfg = model.config
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    loss = make_loss_fn("attn", n_class)
    rng = np.random.default_rng(0)
    b, t = args.b, args.t
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32))
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    key = jax.random.PRNGKey(1)

    def forward(p, rng_i, use_attn: bool, use_gru: bool):
        # mirrors models/attention.py::apply_attn with component switches
        r_attn, r_rnn = split_rng(rng_i, 2)
        mask = length_mask(lengths, t)
        if use_attn:
            h = mha_self_attention(
                p["attention"], x, cfg.num_heads, key_mask=mask,
                dropout_rate=cfg.dropout_rate, train=True, rng=r_attn,
            )
        else:
            h = x
        if use_gru:
            h = gru_apply(p["rnn"], h, lengths, cfg.hidden_dim // 2,
                          bidirectional=True, dropout_rate=0.0, train=True,
                          rng=r_rnn)
        else:
            h = h[..., : cfg.hidden_dim]
        return log_softmax(linear(p["output"], jax.nn.relu(h)))

    def make(use_attn: bool, use_gru: bool, mode: str = "adam"):
        """mode: 'adam' (full step) | 'grad' (value_and_grad, params evolve
        by a tiny SGD nudge to keep the loop chained) | 'fwd' (forward+loss
        only, input nudged per step for the chain)."""
        def loss_fn(p, k):
            return loss(forward(p, k, use_attn, use_gru), targets)

        if mode == "adam":
            @jax.jit
            def run(p, s):
                def body(i, carry):
                    pp, ss, _ = carry
                    l, g = jax.value_and_grad(loss_fn)(
                        pp, jax.random.fold_in(key, i))
                    u, ss = tx.update(g, ss, pp)
                    return (optax.apply_updates(pp, u), ss, l)

                return jax.lax.fori_loop(0, args.steps, body, (p, s, 0.0))
        elif mode == "grad":
            @jax.jit
            def run(p, s):
                def body(i, carry):
                    pp, _, _ = carry
                    l, g = jax.value_and_grad(loss_fn)(
                        pp, jax.random.fold_in(key, i))
                    pp = jax.tree_util.tree_map(
                        lambda a, d: a - 1e-9 * d, pp, g)
                    return (pp, s, l)

                return jax.lax.fori_loop(0, args.steps, body, (p, s, 0.0))
        else:  # fwd
            @jax.jit
            def run(p, s):
                def body(i, carry):
                    _, _, acc = carry
                    # runtime-zero loop-carried nudge (isnan(finite)=0) so the
                    # compiler cannot hoist the forward out of the loop
                    eps = jnp.isnan(acc).astype(jnp.float32)
                    l = loss_fn(
                        jax.tree_util.tree_map(
                            lambda a: a + eps.astype(a.dtype), p),
                        jax.random.fold_in(key, i))
                    return (p, s, l + eps)

                return jax.lax.fori_loop(0, args.steps, body, (p, s, 0.0))

        s0 = tx.init(params)
        out = run(params, s0)  # compile
        assert np.isfinite(float(out[2]))
        return run, s0

    variants = {
        "full": make(True, True),
        "no_gru": make(True, False),
        "no_attn": make(False, True),
        "neither": make(False, False),
        "grad_only": make(True, True, "grad"),
        "fwd_only": make(True, True, "fwd"),
    }
    times = {name: [] for name in variants}
    for _ in range(args.reps):
        for name, (fn, s) in variants.items():
            t0 = time.perf_counter()
            float(fn(params, s)[2])
            times[name].append(time.perf_counter() - t0)
    frames = b * t * args.steps
    med = {}
    for name in variants:
        med[name] = statistics.median(times[name])
        print(f"{name:8s}: {med[name] * 1000 / args.steps:7.2f} ms/step  "
              f"{frames / med[name]:12,.0f} frames/s")
    ms = lambda s: s * 1000 / args.steps  # noqa: E731
    print(f"attention cost (full - no_attn): {ms(med['full'] - med['no_attn']):.2f} ms")
    print(f"GRU cost       (full - no_gru):  {ms(med['full'] - med['no_gru']):.2f} ms")
    print(f"proj/Adam floor (neither):       {ms(med['neither']):.2f} ms")


if __name__ == "__main__":
    main()
