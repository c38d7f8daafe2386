#!/usr/bin/env python
"""Isolate scan overhead: minimal while-loop body vs GRU step body, fwd only
vs train step, on the real TPU."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, steps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    T, B, W, G = 1024, 16, 256, 3
    key = jax.random.PRNGKey(0)
    xg = jax.random.normal(key, (T, B, G * W))
    wh = jax.random.normal(key, (W, G * W)) * 0.01
    bh = jnp.zeros((G * W,))
    m = jnp.ones((T, B, 1))

    # 1) trivial scan body (carry add) — pure loop overhead
    for unroll in [1, 8, 32, 128]:
        @jax.jit
        def trivial(xg):
            def step(h, g_x):
                return h + g_x[:, :W], h
            _, ys = jax.lax.scan(step, jnp.zeros((B, W)), xg, unroll=unroll)
            return ys
        dt = timeit(trivial, xg)
        print(f"trivial scan unroll={unroll}: {dt*1e3:.2f} ms ({dt/T*1e6:.2f} us/step)")

    # 2) GRU step body fwd only
    for unroll in [8, 32, 128]:
        @jax.jit
        def gru(xg, wh, bh, m):
            def step(hp, inp):
                g_x, mm = inp
                hg = hp @ wh + bh
                r = jax.nn.sigmoid(g_x[:, :W] + hg[:, :W])
                z = jax.nn.sigmoid(g_x[:, W:2*W] + hg[:, W:2*W])
                n = jnp.tanh(g_x[:, 2*W:] + r * hg[:, 2*W:])
                hn = (1 - z) * n + z * hp
                hn = jnp.where(mm, hn, hp)
                return hn, hn * mm
            _, ys = jax.lax.scan(step, jnp.zeros((B, W)), (xg, m), unroll=unroll)
            return ys
        dt = timeit(gru, xg, wh, bh, m)
        print(f"gru fwd scan unroll={unroll}: {dt*1e3:.2f} ms ({dt/T*1e6:.2f} us/step)")

    # 3) GRU fwd+bwd
    for unroll in [8, 32, 128]:
        @jax.jit
        def gru_grad(xg, wh, bh, m):
            def loss(wh):
                def step(hp, inp):
                    g_x, mm = inp
                    hg = hp @ wh + bh
                    r = jax.nn.sigmoid(g_x[:, :W] + hg[:, :W])
                    z = jax.nn.sigmoid(g_x[:, W:2*W] + hg[:, W:2*W])
                    n = jnp.tanh(g_x[:, 2*W:] + r * hg[:, 2*W:])
                    hn = (1 - z) * n + z * hp
                    hn = jnp.where(mm, hn, hp)
                    return hn, hn * mm
                _, ys = jax.lax.scan(step, jnp.zeros((B, W)), (xg, m), unroll=unroll)
                return jnp.sum(ys ** 2)
            return jax.grad(loss)(wh)
        dt = timeit(gru_grad, xg, wh, bh, m)
        print(f"gru fwd+bwd unroll={unroll}: {dt*1e3:.2f} ms ({dt/T*1e6:.2f} us/step)")


if __name__ == "__main__":
    main()
