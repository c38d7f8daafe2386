#!/usr/bin/env python
"""Benchmark: training-step throughput on one TPU chip vs. the reference's
PyTorch-CPU equivalent (BASELINE.json metric: frames/sec/chip; north-star
>= 10x the PyTorch CPU reference).

Headline (the one JSON line): flagship BiGRU train step.  Secondary configs
(ms_tcn, bilstm) are benched too and reported as extra keys on the same line
so regressions beyond the flagship are visible round-over-round.

Measurement discipline:
* TPU side chains N full train steps inside ONE jitted ``lax.fori_loop``
  (params evolve step to step) and fetches the final loss scalar — immune to
  async-dispatch / identical-call caching artifacts of the device tunnel.
* Both sides take the MEDIAN of ``RUNS`` timed repeats; the torch baseline
  runs ``REF_STEPS`` (>=3) steps per repeat with an explicit pinned thread
  count — the round-1 single-step baseline had ~2x noise on the shared host.

Prints the cumulative JSON line {"metric", "value", "unit", "vs_baseline",
...} after EVERY completed measurement (and once at the end): the driver
records the stdout tail, so the last complete line parses even if the parent
is killed mid-run.

Robustness (round-3 lesson: BENCH_r03.json was a failure record — the backend
hiccuped once and the whole line was lost; round-4 lesson: the driver
SIGKILLs the parent at ~19 min wall, so budgets default to 1100s total /
420s per task / one non-fatal 300s warm-up probe, tasks run all-train-first
then eval/beam with the offline-reproducible torch-CPU ref LAST, and every
completed measurement re-prints the cumulative line): the parent process
never touches the TPU.
Every measurement runs in its OWN subprocess with a per-config timeout and a
total-runtime budget.  One config crashing, hanging, or hitting a cold
multi-minute Mosaic compile degrades that one key; the JSON line still prints
with whatever succeeded plus an ``errors`` map for what didn't.  Progress
streams unbuffered to stderr so a watcher sees liveness mid-compile.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

import numpy as np

N_CLASS = 48
# Steps chained per jitted fori_loop call.  The tunnel charges ~30 ms of
# dispatch latency per device call regardless of work (profiler trace: the
# 10-iteration ms_tcn eval loop executes in 9.6 ms on-device but times at
# ~42 ms host-side), so per-step numbers at 10 steps under-report fast
# configs by up to 4x.  50 train steps / 400 eval forwards amortize dispatch
# to <1 ms/call of error while keeping loss finite over the chained Adam
# steps (asserted below).
STEPS = int(os.environ.get("PVA_BENCH_STEPS", 50))
EVAL_STEPS = int(os.environ.get("PVA_BENCH_EVAL_STEPS", 400))
REF_STEPS = int(os.environ.get("PVA_BENCH_REF_STEPS", 3))
RUNS = int(os.environ.get("PVA_BENCH_RUNS", 3))
# bf16 mixed precision (f32 master weights/softmax/loss) — the TPU-native
# production configuration; validated for training quality in
# tests/test_training.py::test_bf16_mixed_precision_training_learns
DTYPE = os.environ.get("PVA_BENCH_DTYPE", "bfloat16")
# which configs to run: headline first, secondaries after
MODELS = os.environ.get(
    "PVA_BENCH_MODELS", "bigru,ms_tcn,bilstm,attn").split(",")

# (B, T) per config: bigru/bilstm bench the bucketed-batch regime, ms_tcn and
# attn the whole-video long-T regime they train in (networks.py:298-347,
# :186-203; attn exercises the flash blockwise-attention training path)
SHAPES = {
    "bigru": (int(os.environ.get("PVA_BENCH_B", 64)),
              int(os.environ.get("PVA_BENCH_T", 1024))),
    "bilstm": (64, 1024),
    "ms_tcn": (8, 4096),
    "attn": (4, 4096),
}


# NOTE: configs benched after each other in ONE process read 20-60% slow
# (attn 505k vs 626k standalone, bigru eval 2.0M vs 5.1M — accumulated
# executables/buffers pressure HBM).  Subprocess-per-config (see _spawn)
# reproduces standalone numbers AND isolates failures; recompiles hit the
# persistent cache.


def _median_throughput(fn, frames: int, runs: int) -> float:
    times = []
    for _ in range(runs):
        start = time.perf_counter()
        fn()
        times.append(time.perf_counter() - start)
    return frames / statistics.median(times)


def bench_tpu(model_name: str) -> float:
    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.train.losses import make_loss_fn

    b, t = SHAPES[model_name]
    use_pallas = (
        os.environ.get("PVA_BENCH_MSTCN_PALLAS") == "1"
        if model_name == "ms_tcn" else False
    )
    model = build_model(model_name, N_CLASS, defaults=True,
                        use_pallas=use_pallas)
    params = model.init(jax.random.PRNGKey(0))
    # the production trainer path (flat Adam state — train/optim.py), so the
    # bench measures what `train.py` actually runs
    from pytorch_video_action_tpu.train.optim import make_optimizer

    tx, _ = make_optimizer(1e-3, 30, 1.0)
    opt_state = tx.init(params)
    loss = make_loss_fn(model_name, N_CLASS)

    # every config follows DTYPE.  ms_tcn since round 3 (tap convs made the
    # step bytes-bound: +11.6%, tools/ab_mstcn_bf16.py); attn since round 4
    # (the old "neutral" A/B predates the Pallas flash kernels — with them
    # live, bf16 speeds the GRU/glue portion: 8.75 -> 8.05 ms/step, +8.7%,
    # tools/ab_attn_bf16.py; the flash softmax state stays f32 in-kernel
    # regardless — docs/PERF_NOTES.md)
    cd = None if DTYPE == "float32" else jnp.dtype(DTYPE)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32))
    lengths = jnp.full((b,), t, dtype=jnp.int32)
    targets = jnp.asarray(rng.integers(0, N_CLASS, size=(b * t,)))
    key = jax.random.PRNGKey(1)

    def loss_fn(p, rng_i):
        if cd is not None:  # mixed precision: f32 master -> bf16 body
            p = jax.tree.map(lambda a: a.astype(cd), p)
        out = model.apply(p, x.astype(cd) if cd is not None else x,
                          lengths, train=True, rng=rng_i)
        return loss(out, targets)

    @jax.jit
    def run(params, opt_state):
        def body(i, carry):
            p, s, _ = carry
            l, grads = jax.value_and_grad(loss_fn)(p, jax.random.fold_in(key, i))
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, l)

        return jax.lax.fori_loop(0, STEPS, body, (params, opt_state, 0.0))

    out = run(params, opt_state)  # compile + first run
    assert np.isfinite(float(out[2]))

    def timed():
        final_loss = float(run(params, opt_state)[2])  # forces execution
        assert np.isfinite(final_loss)

    return _median_throughput(timed, b * t * STEPS, RUNS)


def bench_tpu_eval(model_name: str) -> float:
    """Eval/inference forward throughput (the reference's actual deliverable,
    ``inference.py``): guards the stage-fused MS-TCN eval kernel and the
    bigru eval path in BENCH_r*.json (VERDICT r2 item 6)."""
    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from pytorch_video_action_tpu.models import build_model

    b, t = SHAPES[model_name]
    # defaults=True -> Pallas auto-enabled on TPU (stage-fused eval kernel)
    model = build_model(model_name, N_CLASS, defaults=True)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32))
    lengths = jnp.full((b,), t, dtype=jnp.int32)

    @jax.jit
    def run(params, x, lengths):
        def body(i, acc):
            # loop-carried dependence (acc is finite, so this adds 0 at
            # runtime but the compiler cannot hoist the forward out)
            l2 = lengths + jnp.isnan(acc).astype(jnp.int32)
            out = model.apply(params, x, l2, train=False)
            return acc + out.mean().astype(jnp.float32)

        return jax.lax.fori_loop(0, EVAL_STEPS, body, jnp.float32(0))

    assert np.isfinite(float(run(params, x, lengths)))  # compile + check

    def timed():
        assert np.isfinite(float(run(params, x, lengths)))

    return _median_throughput(timed, b * t * EVAL_STEPS, RUNS)


def bench_device_beam() -> float:
    """TPU-vectorized LM beam decode (``lm/device_beam.py``): videos/sec over
    a Breakfast-sized decode batch (48 labels, trigram ARPA)."""
    import tempfile

    from pytorch_video_action_tpu.lm.device_beam import (
        dense_trigram_table, device_beam_search, pack_candidates,
    )
    from pytorch_video_action_tpu.lm.train_arpa import train_arpa

    rng = np.random.default_rng(0)
    corpus = [
        " ".join(str(v) for v in rng.integers(0, N_CLASS, size=rng.integers(4, 14)))
        for _ in range(300)
    ]
    with tempfile.TemporaryDirectory() as d:
        arpa = os.path.join(d, "bench.arpa")
        train_arpa(corpus, arpa, order=3)
        table, ids = dense_trigram_table(arpa, N_CLASS)
    n_videos, n_seg = 64, 12
    per_video = [
        [sorted(set(rng.integers(0, N_CLASS, size=rng.integers(1, 6)).tolist()))
         for _ in range(n_seg)]
        for _ in range(n_videos)
    ]
    cand, nseg = pack_candidates(per_video, N_CLASS)
    device_beam_search(table, ids, cand, nseg, 5)  # compile

    def timed():
        device_beam_search(table, ids, cand, nseg, 5)

    import statistics as _st
    times = []
    for _ in range(RUNS):
        start = time.perf_counter()
        timed()
        times.append(time.perf_counter() - start)
    return n_videos / _st.median(times)


def bench_torch_cpu(model_name: str) -> float:
    """Reference-equivalent workload on CPU, same shapes, pinned threads."""
    import torch

    torch.set_num_threads(
        int(os.environ.get("PVA_BENCH_TORCH_THREADS", os.cpu_count() or 1)))
    torch.manual_seed(0)
    b, t = SHAPES[model_name]

    if model_name == "bigru":
        class RefRNN(torch.nn.Module):
            """networks.py:116-135 BiGRU defaults: 4-layer bidir, hidden 128."""

            def __init__(self):
                super().__init__()
                self.drop = torch.nn.Dropout(0.5)
                self.rnn = torch.nn.GRU(
                    input_size=400, hidden_size=128, num_layers=4,
                    batch_first=True, bidirectional=True, dropout=0.5,
                )
                self.out = torch.nn.Linear(256, N_CLASS)

            def forward(self, x):
                h, _ = self.rnn(self.drop(x))
                return torch.log_softmax(self.out(h.reshape(-1, 256)), dim=1)

        net = RefRNN()
        crit = torch.nn.NLLLoss(ignore_index=-1)
    elif model_name == "bilstm":
        class RefBiLSTM(torch.nn.Module):
            """networks.py:51-87 BiLSTM defaults: 2-layer bidir LSTM hidden
            256//2, linear 256->64 head, cont mode (VERDICT r4 weak #3: the
            old shared RefRNN benched a 4-layer CPU model against our
            correctly 2-layer TPU side)."""

            def __init__(self):
                super().__init__()
                self.drop = torch.nn.Dropout(0.5)
                self.rnn = torch.nn.LSTM(
                    input_size=400, hidden_size=128, num_layers=2,
                    batch_first=True, bidirectional=True, dropout=0.5,
                )
                self.linear = torch.nn.Linear(256, 64)
                self.out = torch.nn.Linear(64, N_CLASS)

            def forward(self, x):
                h, _ = self.rnn(self.drop(x))
                h = self.linear(h).reshape(-1, 64)
                h = self.drop(torch.nn.functional.relu(h))
                return torch.log_softmax(self.out(h), dim=1)

        net = RefBiLSTM()
        crit = torch.nn.NLLLoss(ignore_index=-1)
    elif model_name == "attn":  # networks.py:169-203: MHA -> 1-layer BiGRU
        class RefAttn(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.attention = torch.nn.MultiheadAttention(400, 4, 0.3)
                self.rnn = torch.nn.GRU(400, 128, batch_first=True,
                                        bidirectional=True, num_layers=1)
                self.out = torch.nn.Linear(256, N_CLASS)

            def forward(self, x):
                a = x.transpose(0, 1)
                a, _ = self.attention(a, a, a)
                h, _ = self.rnn(a.transpose(0, 1))
                h = torch.nn.functional.relu(h.reshape(-1, 256))
                return torch.log_softmax(self.out(h), dim=1)

        net = RefAttn()
        crit = torch.nn.NLLLoss(ignore_index=-1)
    else:  # ms_tcn: 4 stages x 20 dilated residual layers (networks.py:298-347)
        class Layer(torch.nn.Module):
            def __init__(self, d, c):
                super().__init__()
                self.cd = torch.nn.Conv1d(c, c, 3, padding=d, dilation=d)
                self.c1 = torch.nn.Conv1d(c, c, 1)
                self.drop = torch.nn.Dropout(0.5)

            def forward(self, x):
                return x + self.drop(self.c1(torch.relu(self.cd(x))))

        class Stage(torch.nn.Module):
            def __init__(self, dim, c=64, n=20):
                super().__init__()
                self.inp = torch.nn.Conv1d(dim, c, 1)
                self.layers = torch.nn.ModuleList(Layer(2 ** i, c) for i in range(n))
                self.out = torch.nn.Conv1d(c, N_CLASS, 1)

            def forward(self, x):
                x = self.inp(x)
                for l in self.layers:
                    x = l(x)
                return self.out(x)

        class RefMSTCN(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.stages = torch.nn.ModuleList(
                    [Stage(400)] + [Stage(N_CLASS) for _ in range(3)])

            def forward(self, x):  # x: [B, C, T] -> flat logits
                out = self.stages[0](x)
                acc = out
                for s in self.stages[1:]:
                    out = s(torch.softmax(out, dim=1))
                    acc = torch.max(acc, out)
                return acc.transpose(1, 2).reshape(-1, N_CLASS)

        net = RefMSTCN()
        crit = torch.nn.CrossEntropyLoss(ignore_index=-1)

    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    if model_name == "ms_tcn":
        x = torch.randn(b, 400, t)
    else:
        x = torch.randn(b, t, 400)
    y = torch.randint(0, N_CLASS, (b * t,))

    def step():
        opt.zero_grad()
        crit(net(x), y).backward()
        opt.step()

    step()  # warmup

    def timed():
        for _ in range(REF_STEPS):
            step()

    return _median_throughput(timed, b * t * REF_STEPS, RUNS)


def _probe_backend() -> None:
    """Child task: tiny matmul to prove the device backend is alive."""
    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    x = jnp.ones((128, 128))
    float((x @ x).block_until_ready()[0, 0])
    print("RESULT 1.0", flush=True)


def _run_child_task(task: str) -> None:
    """Dispatch a single measurement inside a child process and print the
    number on the last stdout line (``RESULT <float>``)."""
    kind, _, name = task.partition(":")
    if kind == "probe":
        return _probe_backend()
    if kind == "train":
        val = bench_tpu(name)
    elif kind == "eval":
        val = bench_tpu_eval(name)
    elif kind == "beam":
        val = bench_device_beam()
    elif kind == "ref":
        val = bench_torch_cpu(name)
    else:
        raise ValueError(f"unknown bench child task {task!r}")
    print(f"RESULT {val!r}", flush=True)


def _spawn(task: str, timeout: float) -> tuple[float | None, str | None]:
    """Run one measurement in a subprocess.  Returns (value, error).

    Child stderr is inherited (streams live); stdout is captured for the
    RESULT line.  Any failure mode — crash, timeout, garbage output — comes
    back as a short error string instead of propagating.
    """
    env = dict(os.environ, PVA_BENCH_CHILD=task, PYTHONUNBUFFERED="1")
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, stderr=None,
            timeout=timeout, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout:.0f}s"
    except Exception as exc:  # spawn failure
        return None, f"spawn failed: {exc}"
    dt = time.perf_counter() - t0
    out = proc.stdout.decode(errors="replace")
    if proc.returncode != 0:
        tail = out.strip().splitlines()[-1] if out.strip() else ""
        return None, f"rc={proc.returncode} after {dt:.0f}s {tail[:200]}"
    for line in reversed(out.strip().splitlines()):
        if line.startswith("RESULT "):
            try:
                return float(line.split()[1]), None
            except ValueError:
                break
    return None, f"no RESULT line in child stdout ({out.strip()[-200:]!r})"


REF_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "docs", "ref_baseline_cache.json")


def main():
    child = os.environ.get("PVA_BENCH_CHILD")
    if child:
        return _run_child_task(child)

    models = [m for m in MODELS if m in SHAPES]
    headline = models[0]
    skip_ref = os.environ.get("PVA_BENCH_SKIP_REF") == "1"
    ref_all = os.environ.get("PVA_BENCH_REF_ALL") == "1"
    # Per-task and total budgets.  VERDICT r4 (the second consecutive lost
    # capture): the driver's observed kill window is ~19 min wall, so the
    # defaults MUST fit inside it — 900s total, 420s per task, ONE 120s
    # probe — and the cumulative JSON line is (re)printed after EVERY
    # completed measurement so the last complete stdout line parses even if
    # the parent is SIGKILLed mid-config.  Task order is all-train-first,
    # then eval, then beam, torch-CPU ref LAST (it's reproducible offline;
    # the TPU numbers are not).
    task_timeout = float(os.environ.get("PVA_BENCH_TASK_TIMEOUT", 420))
    deadline = time.monotonic() + float(os.environ.get("PVA_BENCH_BUDGET", 1100))

    def remaining() -> float:
        return deadline - time.monotonic()

    errors: dict[str, str] = {}
    result: dict = {
        "metric": f"{headline}_train_step_throughput",
        "value": None,
        "unit": "frames/sec/chip",
        "vs_baseline": None,
    }

    def emit() -> None:
        """Print the cumulative result line.  Called after every completed
        measurement: the driver records the stdout tail, so the LAST complete
        line always carries everything measured before a kill."""
        out = {k: v for k, v in result.items() if not k.startswith("_")}
        if errors:
            out["errors"] = errors
        print(json.dumps(out), flush=True)

    def refresh_vs_baseline() -> None:
        fps, ref = result.get("value"), result.get("_ref_fps")
        if fps and ref:
            result["vs_baseline"] = round(fps / ref, 2)

    def measure(task: str, label: str) -> float | None:
        if remaining() < 45:
            errors[label] = "skipped: total budget exhausted"
            print(f"# SKIP {label}: budget exhausted", file=sys.stderr, flush=True)
            return None
        print(f"# start {label} (budget {remaining():.0f}s left)",
              file=sys.stderr, flush=True)
        val, err = _spawn(task, min(task_timeout, remaining()))
        if err is not None:
            errors[label] = err
            print(f"# FAIL {label}: {err}", file=sys.stderr, flush=True)
            return None
        print(f"# done {label}: {val:,.1f}", file=sys.stderr, flush=True)
        return val

    # 1. Backend warm-up probe: ONE attempt, 300s cap (the observed cold
    #    backend init over the tunnel is ~213s — r4 tail).  NON-FATAL: a
    #    probe timeout no longer skips the TPU configs (the first live-TPU
    #    validation of this harness lost the whole capture to exactly that
    #    single point of failure); each config has its own timeout, and the
    #    probe's job is just to pre-warm the tunnel so they start fast.
    probes = int(os.environ.get("PVA_BENCH_PROBE_RETRIES", 1))
    backend_ok = True
    for i in range(probes):
        val, err = _spawn("probe", min(300, max(remaining(), 45)))
        if val is not None:
            print("# backend probe ok", file=sys.stderr, flush=True)
            break
        print(f"# backend probe {i + 1}/{probes} failed ({err}) — "
              "continuing anyway", file=sys.stderr, flush=True)

    # Cached torch-CPU baseline from the most recent successful ref run: the
    # live ref measurement goes LAST, so if the driver kills us first the
    # train keys still carry a vs_baseline (clearly marked as cached).
    try:
        with open(REF_CACHE) as f:
            cached_ref = json.load(f)
        if cached_ref.get(headline):
            result["_ref_fps"] = float(cached_ref[headline])
            result["vs_baseline_source"] = "cached_torch_cpu_ref"
    except (OSError, ValueError):
        pass

    if backend_ok:
        # 2. Train keys first — VERDICT r5 contract: all four must land.
        for name in models:
            fps = measure(f"train:{name}", f"train:{name}")
            if name == headline:
                result["value"] = round(fps, 1) if fps is not None else None
                refresh_vs_baseline()
            elif fps is not None:
                result[f"{name}_fps"] = round(fps, 1)
            emit()

        # 3. Inference surface (VERDICT r2 item 6): eval forwards + beam.
        if os.environ.get("PVA_BENCH_EVAL", "1") == "1":
            for name in ("ms_tcn", "bigru", "attn"):
                if name in models:
                    fps = measure(f"eval:{name}", f"eval:{name}")
                    if fps is not None:
                        result[f"{name}_eval_fps"] = round(fps, 1)
                        emit()
            vps = measure("beam", "device_beam")
            if vps is not None:
                result["device_beam_videos_per_s"] = round(vps, 2)
                emit()

    # 4. Torch-CPU baselines LAST (offline-reproducible; needs no TPU).
    if not skip_ref:
        ref = measure(f"ref:{headline}", f"ref:{headline}")
        if ref is not None:
            result["_ref_fps"] = ref
            result.pop("vs_baseline_source", None)
            refresh_vs_baseline()
            try:
                os.makedirs(os.path.dirname(REF_CACHE), exist_ok=True)
                with open(REF_CACHE, "w") as f:
                    json.dump({headline: ref,
                               "provenance": "live torch-CPU ref from the "
                               "most recent successful bench.py run; used "
                               "as the vs_baseline fallback (marked "
                               "vs_baseline_source) when the driver kill "
                               "window truncates the ref task"}, f)
            except OSError:
                pass
        emit()
        if ref_all:
            for name in models:
                if name != headline and f"{name}_fps" in result:
                    r = measure(f"ref:{name}", f"ref:{name}")
                    if r:
                        result[f"{name}_vs_baseline"] = round(
                            result[f"{name}_fps"] / r, 2)
                        emit()

    result.pop("_ref_fps", None)
    emit()
    if result["value"] is None and not any(
            k.endswith("_fps") for k in result):
        sys.exit(1)  # nothing measured at all


if __name__ == "__main__":
    main()
