"""Device-op timeline for a model's bench-regime train step.

Captures ``jax.profiler.trace`` around chained train steps on the TPU
tunnel, parses the ``*.trace.json.gz`` it writes, and prints device ops
grouped by name with total duration — the methodology that found the
round-4 masked_reverse/threefry glue (docs/PERF_NOTES.md "the profiler
arrives").  Cross-check fusion names against ``--print_hlo``.

Usage: python tools/profile_step_trace.py [--model bigru] [--steps 20]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="bigru")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--b", type=int, default=0)
    ap.add_argument("--t", type=int, default=0)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--eval", action="store_true", help="profile the eval fwd")
    ap.add_argument("--print_hlo", action="store_true")
    ap.add_argument("--outdir", default="/tmp/pva_trace")
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

    bench_shapes = {
        "bigru": (64, 1024, True), "bilstm": (64, 1024, True),
        "ms_tcn": (8, 4096, True), "attn": (4, 4096, True),
    }
    b, t, bf16 = bench_shapes[args.model]
    b, t = (args.b or b), (args.t or t)
    cd = jnp.bfloat16 if bf16 else None

    n_class = 48
    model = build_model(args.model, n_class, defaults=True)
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    loss = make_loss_fn(args.model, n_class)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32))
    if cd is not None:
        x = x.astype(cd)
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    key = jax.random.PRNGKey(1)

    def loss_fn(p, k, train):
        if cd is not None:
            p = jax.tree.map(lambda a: a.astype(cd), p)
        out = model.apply(p, x, lengths, train=train, rng=k)
        return loss(out, targets)

    if args.eval:
        @jax.jit
        def run(p, s):
            def body(i, acc):
                return loss_fn(p, jax.random.fold_in(key, i), False) \
                    .astype(jnp.float32) + acc * 0
            return (None, None,
                    jax.lax.fori_loop(0, args.steps, body, jnp.float32(0)))
        state = None
    else:
        @jax.jit
        def run(p, s):
            def body(i, carry):
                pp, ss, _ = carry
                l, g = jax.value_and_grad(loss_fn)(
                    pp, jax.random.fold_in(key, i), True)
                u, ss = tx.update(g, ss, pp)
                return (optax.apply_updates(pp, u), ss, l)
            return jax.lax.fori_loop(0, args.steps, body, (p, s, 0.0))
        state = tx.init(params)

    out = run(params, state)  # compile + warm
    assert np.isfinite(float(out[2]))
    if args.print_hlo:
        print(jax.jit(run).lower(params, state).compile().as_text())
        return

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        float(run(params, state)[2])

    traces = sorted(glob.glob(
        os.path.join(args.outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        print("no trace written", file=sys.stderr)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device ops live on the TPU pid's "XLA Ops" tid
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dur = defaultdict(float)
    cnt = defaultdict(int)
    meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pid_name = names.get(e["pid"], "")
        tid_name = tids.get((e["pid"], e["tid"]), "")
        if "TPU" not in pid_name and "tpu" not in pid_name.lower():
            continue
        if "XLA Ops" not in tid_name:
            continue
        d = e.get("dur", 0) / 1000.0  # ms
        dur[e["name"]] += d
        cnt[e["name"]] += 1
        total += d
        # trace events carry HLO metadata: long_name (full HLO op text),
        # source (file:line), tf_op (jax op path) — this attribution found
        # the NLL take_along_axis gather (docs/PERF_NOTES.md).
        a = e.get("args") or {}
        if e["name"] not in meta and a:
            meta[e["name"]] = a
    per_step = args.steps
    print(f"# device XLA-op time: {total:.3f} ms over {per_step} steps "
          f"({total / per_step:.3f} ms/step)  [{traces[-1]}]")
    for name in sorted(dur, key=dur.get, reverse=True)[:args.top]:
        print(f"{dur[name] / per_step:8.4f} ms/step  x{cnt[name] // per_step:<4d}"
              f" {name[:110]}")
        a = meta.get(name) or {}
        src, tf_op = a.get("source", ""), a.get("tf_op", "")
        long_name = a.get("long_name", "")
        if src or tf_op:
            print(f"           src={src}  op={tf_op[:90]}")
        if long_name and long_name != name:
            print(f"           hlo={long_name[:160]}")


if __name__ == "__main__":
    main()
