"""Pallas kernel correctness vs. the XLA reference paths (interpret mode on
CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_video_action_tpu.ops.rnn as rnn_ops

T, B, W = 64, 8, 128
GW = 3 * W


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    xg = jnp.asarray(rng.normal(0, 0.5, size=(T, B, GW)).astype(np.float32))
    wh = jnp.asarray(rng.normal(0, 0.05, size=(W, GW)).astype(np.float32))
    bh = jnp.asarray(rng.normal(0, 0.1, size=(GW,)).astype(np.float32))
    lengths = np.array([T, T - 5, T // 2, 3, T, T - 1, 8, T], dtype=np.int32)[:B]
    mask = (np.arange(T)[None, :] < lengths[:, None]).T.astype(np.float32)
    mask = jnp.asarray(mask[:, :, None])  # [T, B, 1]
    return xg, wh, bh, mask


def _xla_ys(xg, wh, bh, mask):
    return rnn_ops._scan_packed("gru", xg, wh, bh, mask, W)


def test_gru_pallas_forward_matches_xla():
    from pytorch_video_action_tpu.ops.rnn_pallas import gru_scan

    xg, wh, bh, mask = _inputs()
    expect = np.asarray(_xla_ys(xg, wh, bh, mask))
    got = gru_scan(xg, wh, bh, mask)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-5, rtol=1e-4)


def test_gru_pallas_gradients_match_xla():
    from pytorch_video_action_tpu.ops.rnn_pallas import gru_scan

    xg, wh, bh, mask = _inputs(1)

    def loss_pallas(xg, wh, bh):
        ys = gru_scan(xg, wh, bh, mask)
        return jnp.sum(ys * jnp.cos(jnp.arange(W))) + jnp.sum(ys**2) * 0.1

    def loss_xla(xg, wh, bh):
        ys = _xla_ys(xg, wh, bh, mask)
        return jnp.sum(ys * jnp.cos(jnp.arange(W))) + jnp.sum(ys**2) * 0.1

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(xg, wh, bh)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(xg, wh, bh)
    for a, b, name in zip(gp, gx, ["dxg", "dwh", "dbh"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3, err_msg=name
        )


def test_gru_pallas_unsupported_shapes_fall_back():
    from pytorch_video_action_tpu.ops.rnn_pallas import gru_scan

    xg = jnp.zeros((60, 8, GW))  # T not a multiple of T_CHUNK
    assert gru_scan(xg, jnp.zeros((W, GW)), jnp.zeros((GW,)), jnp.ones((60, 8, 1))) is None
    xg = jnp.zeros((T, 7, GW))  # B not a multiple of 8
    assert gru_scan(xg, jnp.zeros((W, GW)), jnp.zeros((GW,)), jnp.ones((T, 7, 1))) is None


def test_lstm_pallas_forward_matches_xla():
    from pytorch_video_action_tpu.ops.rnn_pallas import lstm_scan

    rng = np.random.default_rng(3)
    gw = 4 * W
    xg = jnp.asarray(rng.normal(0, 0.5, size=(T, B, gw)).astype(np.float32))
    wh = jnp.asarray(rng.normal(0, 0.05, size=(W, gw)).astype(np.float32))
    lengths = np.array([T, T - 5, T // 2, 3, T, T - 1, 8, T], dtype=np.int32)[:B]
    mask = (np.arange(T)[None, :] < lengths[:, None]).T.astype(np.float32)
    mask = jnp.asarray(mask[:, :, None])

    expect = np.asarray(
        rnn_ops._scan_packed("lstm", xg, wh, jnp.zeros((gw,)), mask, W)
    )
    got = lstm_scan(xg, wh, mask)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-5, rtol=1e-4)


def test_lstm_pallas_gradients_match_xla():
    from pytorch_video_action_tpu.ops.rnn_pallas import lstm_scan

    rng = np.random.default_rng(4)
    gw = 4 * W
    xg = jnp.asarray(rng.normal(0, 0.5, size=(T, B, gw)).astype(np.float32))
    wh = jnp.asarray(rng.normal(0, 0.05, size=(W, gw)).astype(np.float32))
    mask = jnp.ones((T, B, 1))

    def loss_pallas(xg, wh):
        return jnp.sum(lstm_scan(xg, wh, mask) ** 2)

    def loss_xla(xg, wh):
        return jnp.sum(rnn_ops._scan_packed("lstm", xg, wh, jnp.zeros((gw,)), mask, W) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(xg, wh)
    gx = jax.grad(loss_xla, argnums=(0, 1))(xg, wh)
    for a, b, name in zip(gp, gx, ["dxg", "dwh"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3, err_msg=name
        )


def test_bilstm_model_with_pallas_matches():
    from pytorch_video_action_tpu.models import build_model

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(8, 64, 400)).astype(np.float32))
    lengths = jnp.asarray(np.array([64, 60, 33, 10, 64, 5, 25, 64], dtype=np.int32))
    model = build_model("bilstm", 6, defaults=True)
    params = model.init(jax.random.PRNGKey(0))

    out_xla = np.asarray(model.apply(params, x, lengths, train=False))
    rnn_ops.USE_PALLAS = True
    try:
        out_pl = np.asarray(model.apply(params, x, lengths, train=False))
    finally:
        rnn_ops.USE_PALLAS = False
    np.testing.assert_allclose(out_pl, out_xla, atol=1e-4, rtol=1e-3)


def test_bigru_model_with_pallas_matches():
    """End-to-end: bigru forward with USE_PALLAS on == XLA path off."""
    from pytorch_video_action_tpu.models import build_model

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 64, 400)).astype(np.float32))
    lengths = jnp.asarray(np.array([64, 60, 33, 10, 64, 5, 25, 64], dtype=np.int32))
    model = build_model("bigru", 6, defaults=True)
    params = model.init(jax.random.PRNGKey(0))

    out_xla = np.asarray(model.apply(params, x, lengths, train=False))
    rnn_ops.USE_PALLAS = True
    try:
        out_pl = np.asarray(model.apply(params, x, lengths, train=False))
    finally:
        rnn_ops.USE_PALLAS = False
    np.testing.assert_allclose(out_pl, out_xla, atol=1e-4, rtol=1e-3)


# ================================================================ fused conv


def _conv_layer(seed=0, c=64):
    from pytorch_video_action_tpu.ops.conv import init_conv1d

    r1, r2 = jax.random.split(jax.random.PRNGKey(seed))
    return {
        "conv_dilated": init_conv1d(r1, c, c, 3),
        "conv_1x1": init_conv1d(r2, c, c, 1),
    }


def _conv_inputs(seed=0, b=2, t=48, c=64):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    lengths = np.array([t, t // 2] * (b // 2), np.int32)[:b]
    mask = jnp.asarray(
        (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)[:, :, None]
    )
    return x, mask


@pytest.mark.parametrize("dilation", [1, 4, 16, 64])
def test_fused_dilated_residual_matches_xla(dilation):
    """dilation=64 > T exercises the taps-contribute-zero path."""
    from pytorch_video_action_tpu.ops.conv import dilated_residual_layer
    from pytorch_video_action_tpu.ops.conv_pallas import fused_dilated_residual

    layer = _conv_layer()
    x, mask = _conv_inputs()
    expect = np.asarray(
        dilated_residual_layer(layer, x, mask, dilation=dilation, train=False)
    )
    got = fused_dilated_residual(layer, x, mask, dilation)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-5, rtol=1e-4)


def test_fused_dilated_residual_grads_match_xla():
    from pytorch_video_action_tpu.ops.conv import dilated_residual_layer
    from pytorch_video_action_tpu.ops.conv_pallas import fused_dilated_residual

    layer = _conv_layer(1)
    x, mask = _conv_inputs(1)

    def loss_pallas(layer, x):
        return jnp.sum(fused_dilated_residual(layer, x, mask, 4) ** 2)

    def loss_xla(layer, x):
        return jnp.sum(
            dilated_residual_layer(layer, x, mask, dilation=4, train=False) ** 2
        )

    gp = jax.grad(loss_pallas, argnums=(0, 1))(layer, x)
    gx = jax.grad(loss_xla, argnums=(0, 1))(layer, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4)


def test_mstcn_pallas_model_matches_xla():
    from pytorch_video_action_tpu.models import mstcn

    cfg_x = mstcn.MSTCNConfig(dim=16, num_stages=2, num_layers=5, num_f_maps=64,
                              n_class=5, use_pallas=False)
    cfg_p = mstcn.MSTCNConfig(dim=16, num_stages=2, num_layers=5, num_f_maps=64,
                              n_class=5, use_pallas=True)
    params = mstcn.init(jax.random.PRNGKey(0), cfg_x)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 40, 16)).astype(np.float32))
    lengths = jnp.asarray(np.array([40, 23], np.int32))
    out_x = np.asarray(mstcn.apply(params, cfg_x, x, lengths, train=False))
    out_p = np.asarray(mstcn.apply(params, cfg_p, x, lengths, train=False))
    np.testing.assert_allclose(out_p, out_x, atol=3e-5, rtol=1e-4)
