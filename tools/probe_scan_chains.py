"""Feasibility probe for the layer-wavefront GRU kernel (VERDICT r3 item 3).

The fused bidirectional GRU scan runs ~2.7 us/step against ~1 us of work —
per-step latency (dependency stalls), not throughput.  A wavefront schedule
over the 4 stacked layers would interleave 4 INDEPENDENT dependency chains
(cells (l, t) with l+t=s have no mutual deps) in one kernel body.  This
probe measures the payoff without building the plumbing: K independent GRU
cells per step in one Pallas kernel, same shapes as the fused bigru layer
(h [B, 2H], Wh [2H, 3*2H]).  If time/step stays ~flat as K grows, the
wavefront delivers ~K x on the scan.

Variants:
  chains{K}   K independent full GRU cells per step (K=1 ~ current kernel)
  mm_only     matmul + store only — the dependency-chain latency floor
  split_gate  r/z sigmoids overlap the n-gate's separate hidden matmul

Usage: python tools/probe_scan_chains.py [--t 1024 --b 64 --w 256 --reps 5]
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
    ap.add_argument("--t", type=int, default=1024)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--w", type=int, default=256,
                    help="hidden width per chain (fused bidir layer = 2H)")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--loops", type=int, default=20,
                    help="kernel invocations chained per timing (dispatch amortization)")
    args = ap.parse_args(argv)

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, W, CH = args.t, args.b, args.w, args.chunk
    GW = 3 * W

    def make_kernel(k_chains: int, body_kind: str):
        py_loop = body_kind.endswith("_py")
        if py_loop:
            body_kind = body_kind[: -len("_py")]
        if body_kind == "ssa_carry":
            # carry h as an SSA value through the fori_loop instead of a
            # VMEM scratch round-trip per step (isolates ref store/load cost)
            def kernel(xg_ref, wh_ref, h0_ref, ys_ref, *h_refs):
                i = pl.program_id(0)

                @pl.when(i == 0)
                def _():
                    h_refs[0][:] = h0_ref[:]

                def body(t, h):
                    g_x = xg_ref[t]
                    hn = h * 0.99 + g_x[:, :W]
                    ys_ref[t] = hn
                    return hn

                h_fin = jax.lax.fori_loop(
                    0, xg_ref.shape[0], body, h_refs[0][:], unroll=True)
                h_refs[0][:] = h_fin

            return kernel

        def kernel(xg_ref, wh_ref, h0_ref, ys_ref, *h_refs):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                for h in h_refs:
                    h[:] = h0_ref[:]

            def body(t, _):
                g_x = xg_ref[t]
                acc = None
                for k in range(k_chains):
                    h = h_refs[k][:]
                    if body_kind == "mm_only":
                        hg = jnp.dot(h, wh_ref[k],
                                     preferred_element_type=jnp.float32)
                        hn = hg[:, :W] + g_x[:, :W]
                    elif body_kind == "ew_only":  # no matmul: loop/store floor
                        hn = h * 0.99 + g_x[:, :W]
                    elif body_kind == "carry_only":  # no g_x load either
                        hn = h * 0.99 + 0.01
                    elif body_kind == "no_store":  # g_x load, store once/chunk
                        hn = h * 0.99 + g_x[:, :W]
                    elif body_kind == "mm_narrow":  # [B,W]@[W,W]: one MXU tile col
                        hg = jnp.dot(h, wh_ref[k][:, :W],
                                     preferred_element_type=jnp.float32)
                        hn = hg + g_x[:, :W]
                    elif body_kind == "split_gate":
                        hg_rz = jnp.dot(h, wh_ref[k][:, : 2 * W],
                                        preferred_element_type=jnp.float32)
                        hg_n = jnp.dot(h, wh_ref[k][:, 2 * W :],
                                       preferred_element_type=jnp.float32)
                        r = jax.nn.sigmoid(g_x[:, :W] + hg_rz[:, :W])
                        z = jax.nn.sigmoid(g_x[:, W : 2 * W] + hg_rz[:, W:])
                        n = jnp.tanh(g_x[:, 2 * W :] + r * hg_n)
                        hn = (1.0 - z) * n + z * h
                    else:
                        hg = jnp.dot(h, wh_ref[k],
                                     preferred_element_type=jnp.float32)
                        r = jax.nn.sigmoid(g_x[:, :W] + hg[:, :W])
                        z = jax.nn.sigmoid(g_x[:, W : 2 * W] + hg[:, W : 2 * W])
                        n = jnp.tanh(g_x[:, 2 * W :] + r * hg[:, 2 * W :])
                        hn = (1.0 - z) * n + z * h
                    h_refs[k][:] = hn
                    acc = hn if acc is None else acc + hn
                if body_kind != "no_store":
                    ys_ref[t] = acc
                return 0

            if py_loop:  # Python loop: guaranteed trace-time unroll
                for t in range(xg_ref.shape[0]):
                    body(t, 0)
            else:
                jax.lax.fori_loop(0, xg_ref.shape[0], body, 0, unroll=True)
            if body_kind == "no_store":  # one store/chunk keeps chain live
                ys_ref[0] = h_refs[0][:]

        return kernel

    rng = np.random.default_rng(0)
    xg = jnp.asarray(rng.normal(size=(T, B, GW)).astype(np.float32))

    def build(k_chains, body_kind, gw_stream=None):
        # gw_stream: width of the STREAMED xg block (None = full GW).  A
        # narrower stream tests the DMA-bandwidth hypothesis: if per-step
        # time scales with streamed bytes, the scan is HBM->VMEM bound.
        gs = GW if gw_stream is None else gw_stream
        wh = jnp.asarray(
            rng.normal(size=(k_chains, W, GW)).astype(np.float32) * 0.05)
        call = pl.pallas_call(
            make_kernel(k_chains, body_kind),
            grid=(T // CH,),
            in_specs=[
                pl.BlockSpec((CH, B, gs), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_chains, W, GW), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CH, B, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, B, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, W), jnp.float32)
                            for _ in range(k_chains)],
        )

        @jax.jit
        def run(xg):
            # chain `loops` kernel invocations so dispatch amortizes and the
            # compiler cannot elide any call.  The chain variable is the
            # small [B, W] initial hidden state — xg stays loop-invariant
            # (earlier chainings that touched xg added 0.6-1.0 us/step of
            # pure copy traffic and polluted the floor measurement).
            def loop(i, h0):
                ys = call(xg, wh, h0)
                return ys[-1]

            return jax.lax.fori_loop(
                0, args.loops, loop, jnp.zeros((B, W), jnp.float32))

        out = run(xg)
        jax.block_until_ready(out)
        return run

    variants = {
        "carry_gs128": build(1, "carry_only", gw_stream=128),
        "carry_py": build(1, "carry_only_py", gw_stream=128),
        "ew_gs768": build(1, "ew_only"),
        "full_py": build(1, "full_py"),
        "chains1": build(1, "full"),
        "split_gate": build(1, "split_gate"),
        "chains2": build(2, "full"),
        "chains4": build(4, "full"),
    }
    times = {k: [] for k in variants}
    for _ in range(args.reps):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(xg))
            times[name].append(time.perf_counter() - t0)
    for name in variants:
        med = statistics.median(times[name])
        per_step = med / (T * args.loops) * 1e9
        print(f"{name:>10}: {med * 1000:8.2f} ms total   {per_step:7.0f} ns/step")


if __name__ == "__main__":
    main()
