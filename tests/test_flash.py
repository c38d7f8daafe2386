"""Flash (blockwise custom-VJP) attention: values + grads vs the dense path.

Covers VERDICT item 2: the ``attn`` model must TRAIN long videos without the
dense ``[B, H, T, T]`` tensor (the reference trains full videos,
``/root/reference/networks.py:186-203``), with exact post-softmax attention
dropout and a recompute backward.
"""

import numpy as np

import jax
import jax.numpy as jnp

from pytorch_video_action_tpu.ops.flash import (
    _flash_fwd_scan,
    flash_self_attention,
)


def _mk_qkv(b=2, h=2, t=96, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32)) / np.sqrt(d)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    lengths = np.array([t, t - 37][:b], np.int32)
    mask = jnp.asarray(np.arange(t)[None, :] < lengths[:, None])
    return q, k, v, mask, lengths


def _dense(q, k, v, mask):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)


def test_flash_matches_dense_values_and_grads():
    q, k, v, mask, lengths = _mk_qkv()
    w = jnp.asarray(
        np.random.default_rng(1).normal(size=q.shape).astype(np.float32)
    )
    # only valid query rows contribute (flash emits zeros at padded rows,
    # dense emits a uniform average — both discarded downstream)
    row_valid = mask[:, None, :, None]

    def loss_flash(q, k, v):
        out = flash_self_attention(q, k, v, mask, 0.0, None, 32)
        return jnp.sum(out * w * row_valid)

    def loss_dense(q, k, v):
        return jnp.sum(_dense(q, k, v, mask) * w * row_valid)

    lf, gf = jax.value_and_grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    ld, gd = jax.value_and_grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-5)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-4
        )


def test_flash_dropout_vjp_matches_autodiff():
    """The hand-derived backward (with the delta identity under dropout) must
    equal plain autodiff through the identical blockwise forward."""
    q, k, v, mask, _ = _mk_qkv(seed=2)
    rng = jax.random.PRNGKey(5)
    w = jnp.asarray(
        np.random.default_rng(3).normal(size=q.shape).astype(np.float32)
    )
    row_valid = mask[:, None, :, None]

    def loss_custom(q, k, v):
        out = flash_self_attention(q, k, v, mask, 0.4, rng, 32)
        return jnp.sum(out * w * row_valid)

    def loss_autodiff(q, k, v):
        out, _, _ = _flash_fwd_scan(q, k, v, mask, 0.4, rng, 32)
        return jnp.sum(out * w * row_valid)

    lc, gc = jax.value_and_grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
    la, ga = jax.value_and_grad(loss_autodiff, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(lc), float(la), rtol=1e-5)
    for a, b_ in zip(gc, ga):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-4
        )


def test_flash_bwd_block_differs_from_fwd_exact_under_dropout():
    """PVA_FLASH_BLOCK_BWD: the backward may run its own KV block size.
    Dropout masks are keyed by GLOBAL kv column (not block index), so the
    recompute regenerates the identical sampled mask and grads stay exact
    vs autodiff through the same forward."""
    from pytorch_video_action_tpu.ops import flash as F

    q, k, v, mask, _ = _mk_qkv(seed=7)
    rng = jax.random.PRNGKey(9)
    w = jnp.asarray(
        np.random.default_rng(8).normal(size=q.shape).astype(np.float32)
    )
    row_valid = mask[:, None, :, None]

    def loss_custom(q, k, v):
        out = flash_self_attention(q, k, v, mask, 0.4, rng, 32)
        return jnp.sum(out * w * row_valid)

    def loss_autodiff(q, k, v):
        out, _, _ = _flash_fwd_scan(q, k, v, mask, 0.4, rng, 32)
        return jnp.sum(out * w * row_valid)

    la, ga = jax.value_and_grad(loss_autodiff, argnums=(0, 1, 2))(q, k, v)
    orig = F.BWD_BLOCK
    try:
        for bwd_block in (16, 48, 96):  # != fwd 32; incl. non-divisor of T
            F.BWD_BLOCK = bwd_block
            lc, gc = jax.value_and_grad(
                loss_custom, argnums=(0, 1, 2))(q, k, v)
            np.testing.assert_allclose(float(lc), float(la), rtol=1e-5)
            for a, b_ in zip(gc, ga):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-4
                )
    finally:
        F.BWD_BLOCK = orig


def test_flash_bf16_inputs_f32_softmax_state():
    """bf16 q/k/v: matmuls run in bf16 but the online-softmax state stays
    f32 — outputs match the f32 dense reference within bf16 rounding, the
    output dtype follows the input, and grads are bf16 and finite."""
    q, k, v, mask, _ = _mk_qkv(t=128, seed=11)
    out_ref = _dense(q, k, v, mask)
    qb, kb, vb = (a.astype(jnp.bfloat16) for a in (q, k, v))
    out = flash_self_attention(qb, kb, vb, mask, 0.0, None, 32)
    assert out.dtype == jnp.bfloat16
    rv = np.asarray(mask)[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(out, np.float32) * rv,
        np.asarray(out_ref) * rv,
        atol=3e-2, rtol=3e-2,  # bf16 has 8 mantissa bits
    )

    def loss(q, k, v):
        o = flash_self_attention(q, k, v, mask, 0.3, jax.random.PRNGKey(3), 32)
        return jnp.sum((o * mask[:, None, :, None]).astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb)
    for g in grads:
        assert g.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(g, np.float32)).all()


def test_flash_env_block_validation():
    from pytorch_video_action_tpu.ops.flash import _env_block

    import os
    os.environ["_PVA_TEST_BLOCK"] = "0"
    try:
        import pytest
        with pytest.raises(ValueError, match="_PVA_TEST_BLOCK"):
            _env_block("_PVA_TEST_BLOCK", 64)
        os.environ["_PVA_TEST_BLOCK"] = "abc"
        with pytest.raises(ValueError, match="_PVA_TEST_BLOCK"):
            _env_block("_PVA_TEST_BLOCK", 64)
        os.environ["_PVA_TEST_BLOCK"] = "128"
        assert _env_block("_PVA_TEST_BLOCK", 64) == 128
    finally:
        del os.environ["_PVA_TEST_BLOCK"]
    assert _env_block("_PVA_TEST_BLOCK", 64) == 64


def test_flash_fully_masked_rows_zero_output_and_grads():
    q, k, v, mask, _ = _mk_qkv(b=1, t=64, seed=4)
    mask = jnp.zeros_like(mask)  # nothing attendable

    def loss(q, k, v):
        return jnp.sum(flash_self_attention(q, k, v, mask, 0.0, None, 32) ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert float(val) == 0.0
    for g in grads:
        assert float(jnp.abs(g).max()) == 0.0


def test_mha_train_blockwise_matches_dense_grads():
    """Model-level: mha_self_attention's long-sequence TRAIN path (flash)
    produces the same grads as the dense path (dropout off)."""
    from pytorch_video_action_tpu.models import attention as A

    e, heads, b, t = 16, 4, 2, 160
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(b, t, e)).astype(np.float32))
    mask = jnp.asarray(np.arange(t)[None, :] < np.array([[t], [t - 50]]))
    p = A.init_mha(jax.random.PRNGKey(0), e)
    w = jnp.asarray(rng.normal(size=(b, t, e)).astype(np.float32))
    w = w * mask[..., None]

    def loss(p, min_t):
        orig = A.BLOCKWISE_MIN_T
        A.BLOCKWISE_MIN_T = min_t
        try:
            out = A.mha_self_attention(
                p, x, heads, key_mask=mask, dropout_rate=0.0, train=True
            )
        finally:
            A.BLOCKWISE_MIN_T = orig
        return jnp.sum(out * w)

    lf, gf = jax.value_and_grad(lambda p: loss(p, 10))(p)
    ld, gd = jax.value_and_grad(lambda p: loss(p, 10**9))(p)
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-5)
    for key in gf:
        np.testing.assert_allclose(
            np.asarray(gf[key]), np.asarray(gd[key]), atol=3e-5, rtol=1e-4
        )


def test_attn_model_trains_long_video():
    """End-to-end: one train step of the attn model above the blockwise
    threshold (T >= 1024) runs the flash path and yields a finite loss."""
    import optax

    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.train.losses import nll_loss

    n_class = 8
    model = build_model("attn", n_class, attn_head=4)
    params = model.init(jax.random.PRNGKey(0))
    b, t = 2, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32))
    lengths = jnp.asarray(np.array([t, t - 100], np.int32))
    targets = jnp.asarray(rng.integers(0, n_class, size=(b * t,)))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, key):
        def loss_fn(p):
            out = model.apply(p, x, lengths, train=True, rng=key)
            return nll_loss(out, targets)

        l, grads = jax.value_and_grad(loss_fn)(p)
        up, s = tx.update(grads, s, p)
        return optax.apply_updates(p, up), s, l

    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
