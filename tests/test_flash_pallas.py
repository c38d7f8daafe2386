"""Equivalence tests for the query-tiled Pallas flash-attention kernels
(``ops/flash_pallas.py``) against the XLA blockwise scan (``ops/flash.py``)
— values, gradients, the shared global-index dropout stream, tile-size
invariance, and the masked-row / padding contracts.  Pallas runs in
interpret mode on CPU (the dispatcher keys interpret off the backend).

Reference workload: ``networks.py:169-203`` (whole-video MHA training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_video_action_tpu.ops.flash as flash
import pytorch_video_action_tpu.ops.flash_pallas as fp


def _data(b=2, h=3, t=384, d=36, seed=0, full_mask_row=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, t)) > 0.2)
    if full_mask_row:
        mask = mask.at[-1].set(False)  # one fully-masked batch element
    dout = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    return q, k, v, mask, dout


def _run(monkeypatch, pallas: bool, q, k, v, mask, dout, rate=0.0, rng=None,
         block=64, mxu_bf16=False, fused=True):
    # exact-equivalence tests pin f32 MXU operands; the bf16-operand mode
    # (the TPU default, mirroring XLA's own bf16 propagation) has its own
    # loose-tolerance test below
    monkeypatch.setattr(fp, "MXU_BF16", mxu_bf16)
    monkeypatch.setattr(fp, "FUSED_BWD", fused)
    monkeypatch.setenv("PVA_FLASH_PALLAS", "1" if pallas else "0")

    def f(q, k, v):
        return flash.flash_self_attention(q, k, v, mask, rate, rng, block)

    out, vjp = jax.vjp(f, q, k, v)
    return out, vjp(dout.astype(out.dtype))


@pytest.mark.parametrize("fused", [True, False])  # 1-pass vs 2-kernel bwd
@pytest.mark.parametrize("t", [384, 330])  # tile-aligned and padded
def test_flash_pallas_matches_xla_no_dropout(monkeypatch, t, fused):
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_Q", 128)
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_KV", 128)
    q, k, v, mask, dout = _data(t=t)
    o_x, g_x = _run(monkeypatch, False, q, k, v, mask, dout)
    o_p, g_p = _run(monkeypatch, True, q, k, v, mask, dout, fused=fused)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               atol=5e-5, rtol=1e-4)
    for a, b, name in zip(g_x, g_p, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-3, err_msg=f"d{name}")


@pytest.mark.parametrize("fused", [True, False])
def test_flash_pallas_dropout_stream_matches_xla(monkeypatch, fused):
    """Same rng => the Pallas kernels regenerate the XLA path's exact
    sampled mask (global [B,H,T,T_kv] element-index hash): values and
    grads agree to float tolerance, which fails catastrophically if even
    one mask bit differs."""
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_Q", 128)
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_KV", 128)
    q, k, v, mask, dout = _data()
    key = jax.random.PRNGKey(11)
    o_x, g_x = _run(monkeypatch, False, q, k, v, mask, dout, 0.3, key)
    o_p, g_p = _run(monkeypatch, True, q, k, v, mask, dout, 0.3, key,
                    fused=fused)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               atol=5e-5, rtol=1e-4)
    for a, b, name in zip(g_x, g_p, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-3, err_msg=f"d{name}")
    # and a different key samples a different mask (stream actually live)
    o_p2, _ = _run(monkeypatch, True, q, k, v, mask, dout, 0.3,
                   jax.random.PRNGKey(12))
    assert float(jnp.abs(o_p2 - o_p).max()) > 1e-3


def test_flash_pallas_tile_size_invariance(monkeypatch):
    """The online softmax is exact at any (bq, bkv) partition, and the
    dropout stream is keyed by global element index, so tile sizes must not
    change values (beyond float reassociation)."""
    q, k, v, mask, dout = _data(t=256, d=20)
    key = jax.random.PRNGKey(3)
    results = []
    for bq, bkv in [(128, 128), (256, 64), (64, 256)]:
        monkeypatch.setattr(fp, "DEFAULT_BLOCK_Q", bq)
        monkeypatch.setattr(fp, "DEFAULT_BLOCK_KV", bkv)
        results.append(_run(monkeypatch, True, q, k, v, mask, dout, 0.25, key))
    (o0, g0), rest = results[0], results[1:]
    for o, g in rest:
        np.testing.assert_allclose(np.asarray(o), np.asarray(o0),
                                   atol=5e-5, rtol=1e-4)
        for a, b in zip(g0, g):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-4, rtol=1e-3)


def test_flash_pallas_fused_bkv_override_invariance(monkeypatch):
    """Forcing the fused backward's KV tile (``fused_bkv`` / the
    PVA_FLASH_FUSED_BKV hook) must not change grads: the dropout stream is
    global-element-index keyed and the dq/dk/dv accumulation is exact at
    any KV partition."""
    q, k, v, mask, dout = _data(t=256, d=20)
    key = jax.random.PRNGKey(5)
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_Q", 128)
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_KV", 128)
    _, g0 = _run(monkeypatch, True, q, k, v, mask, dout, 0.25, key)
    for width in (128, 256):
        monkeypatch.setattr(fp, "_FUSED_BKV_OVERRIDE", width)
        _, g = _run(monkeypatch, True, q, k, v, mask, dout, 0.25, key)
        for a, b, name in zip(g0, g, "qkv"):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-3,
                err_msg=f"d{name} @ fused_bkv={width}")


def test_flash_pallas_fused_bkv_env_validation(monkeypatch):
    monkeypatch.setenv("PVA_FLASH_FUSED_BKV", "100")
    with pytest.raises(ValueError, match="PVA_FLASH_FUSED_BKV"):
        fp._env_fused_bkv()
    monkeypatch.setenv("PVA_FLASH_FUSED_BKV", "256")
    assert fp._env_fused_bkv() == 256


def test_flash_pallas_masked_rows_zero(monkeypatch):
    """Fully-masked batch rows emit zero output and propagate zero grads
    (the kernel's NEG_INF row-max contract)."""
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_Q", 128)
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_KV", 128)
    q, k, v, mask, dout = _data()
    o_p, (dq, dk, dv) = _run(monkeypatch, True, q, k, v, mask, dout)
    assert float(jnp.abs(o_p[-1]).max()) == 0.0
    assert float(jnp.abs(dq[-1]).max()) == 0.0
    assert float(jnp.abs(dk[-1]).max()) == 0.0
    assert float(jnp.abs(dv[-1]).max()) == 0.0
    assert np.isfinite(np.asarray(dq)).all()


def test_flash_pallas_bf16_inputs(monkeypatch):
    """bf16 q/k/v ride the MXU dots in bf16 while the softmax state stays
    f32 — same contract as the XLA path, same output dtype."""
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_Q", 128)
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_KV", 128)
    q, k, v, mask, dout = _data()
    qb, kb, vb = (a.astype(jnp.bfloat16) for a in (q, k, v))
    o_x, g_x = _run(monkeypatch, False, qb, kb, vb, mask, dout)
    o_p, g_p = _run(monkeypatch, True, qb, kb, vb, mask, dout)
    assert o_p.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(o_p, np.float32), np.asarray(o_x, np.float32),
        atol=3e-2, rtol=3e-2,
    )
    for a, b, name in zip(g_x, g_p, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            atol=1e-1, rtol=5e-2, err_msg=f"d{name}",
        )


def test_flash_pallas_mxu_bf16_operands_close_to_f32(monkeypatch):
    """MXU_BF16=True (the TPU default) demotes only the dot OPERANDS to
    bf16 — accumulation, softmax state and outputs stay f32, so results
    track the f32 kernel to bf16 rounding, not bf16 catastrophe."""
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_Q", 128)
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_KV", 128)
    q, k, v, mask, dout = _data()
    o_32, g_32 = _run(monkeypatch, True, q, k, v, mask, dout, mxu_bf16=False)
    o_16, g_16 = _run(monkeypatch, True, q, k, v, mask, dout, mxu_bf16=True)
    assert o_16.dtype == o_32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(o_16), np.asarray(o_32),
                               atol=1e-1, rtol=5e-2)
    for a, b, name in zip(g_32, g_16, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-1, rtol=5e-2, err_msg=f"d{name}")


def test_fused_pick_stays_under_vmem_limit():
    """Every KV tile the AUTO pick admits must fit the kernel's explicit
    scoped-VMEM request with margin: the measured Mosaic stack runs ~1.05x
    the estimate (16.78M est -> 17.54M measured at the bench shape), so we
    require estimate*1.3 <= _FUSED_VMEM_LIMIT.  Guards against budget/limit
    drift reintroducing the AOT-compile OOM that a runtime-JIT A/B admits
    (the round-4 regression: default-16M scoped limit vs 17.54M stack)."""
    for t in (256, 1024, 2048, 4096, 8192, 16384, 65536):
        for d in (64, 128, 256):
            for bf16 in (True, False):
                pick = fp._fused_pick(t, d, bf16)
                if pick is None:
                    continue
                est = fp._fused_est(t, d, pick, bf16)
                assert est * 1.3 <= fp._FUSED_VMEM_LIMIT, (t, d, bf16, pick)
    # the bench workload must keep the tuned 256-wide tile (the +31% pick)
    assert fp._fused_pick(4096, 128, True) == 256
    # very long T falls out of the fused form entirely (two-kernel split)
    assert fp._fused_pick(65536, 128, True) is None


@pytest.mark.parametrize("rate", [0.0, 0.25])
@pytest.mark.parametrize("fused", [True, False])  # fused / split-fallback bwd
def test_flash_bthd_layout_matches_bhtd(monkeypatch, rate, fused):
    """The head-major flat [B, T, H*d] entry point must reproduce the
    [B, H, T, d] path bit-for-bit in what it samples (same global-index
    dropout stream) and to float tolerance in values/grads — the kernels
    and tiles are identical, only the BlockSpec index maps differ."""
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_Q", 128)
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_KV", 128)
    monkeypatch.setattr(fp, "FUSED_BWD", fused)
    monkeypatch.setenv("PVA_FLASH_PALLAS", "1")
    b, h, t, d = 2, 2, 200, 128
    q, k, v, mask, dout = _data(b=b, h=h, t=t, d=d)
    key = jax.random.PRNGKey(7) if rate else None

    def f_bhtd(q, k, v):
        return flash.flash_self_attention(q, k, v, mask, rate, key, 64)

    def f_bthd(qt, kt, vt):
        return flash.flash_self_attention_bthd(qt, kt, vt, mask, h, rate, key)

    o0, vjp0 = jax.vjp(f_bhtd, q, k, v)
    g0 = vjp0(dout)
    tr = lambda a: a.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    untr = lambda a: a.reshape(b, t, h, d).transpose(0, 2, 1, 3)
    o1, vjp1 = jax.vjp(f_bthd, tr(q), tr(k), tr(v))
    g1 = vjp1(tr(dout))
    np.testing.assert_allclose(np.asarray(untr(o1)), np.asarray(o0),
                               atol=5e-5, rtol=1e-4)
    for a, b_, name in zip(g0, g1, "qkv"):
        np.testing.assert_allclose(np.asarray(untr(b_)), np.asarray(a),
                                   atol=2e-4, rtol=1e-3, err_msg=f"d{name}")


@pytest.mark.parametrize("train", [False, True])
def test_mha_bthd_folded_projection_equivalence(monkeypatch, train):
    """Model-level: the folded head-major projection (pad + 1/sqrt(hd)
    scale inside the weights, zero transposes) must match the standard
    heads()-transpose flash path — forward and parameter gradients."""
    import pytorch_video_action_tpu.models.attention as A

    monkeypatch.setattr(fp, "DEFAULT_BLOCK_Q", 128)
    monkeypatch.setattr(fp, "DEFAULT_BLOCK_KV", 128)
    monkeypatch.setattr(A, "BLOCKWISE_MIN_T", 64)
    monkeypatch.setenv("PVA_FLASH_PALLAS", "1")
    rng = np.random.default_rng(5)
    b, t, e, h = 2, 160, 16, 2  # hd=8 -> pads to 128 lanes
    x = jnp.asarray(rng.normal(size=(b, t, e)).astype(np.float32))
    mask = jnp.asarray(np.arange(t)[None, :] < np.array([[t], [t - 37]]))
    p = A.init_mha(jax.random.PRNGKey(0), e)
    key = jax.random.PRNGKey(3)

    def run(p, x):
        return A.mha_self_attention(
            p, x, h, key_mask=mask, dropout_rate=0.3 if train else 0.0,
            train=train, rng=key,
        ).sum()

    outs, grads = [], []
    for flag in ("0", "1"):
        monkeypatch.setenv("PVA_FLASH_BTHD", flag)
        val, g = jax.value_and_grad(run, argnums=(0, 1))(p, x)
        outs.append(np.asarray(val))
        grads.append(g)
    np.testing.assert_allclose(outs[1], outs[0], atol=5e-4, rtol=1e-4)
    flat0 = jax.tree_util.tree_leaves_with_path(grads[0])
    flat1 = jax.tree_util.tree_leaves(grads[1])
    for (path, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=1e-3, err_msg=str(path))
