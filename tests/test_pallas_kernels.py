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


@pytest.mark.parametrize("dilation", [1, 2, 16, 63, 64, 200])
def test_conv_taps_matches_conv_op(dilation):
    """Tap formulation (shift + matmul, ops/conv.py CONV_TAPS — the 2.3x
    production train-step win) == lax.conv_general_dilated, for every
    dilation class incl. d >= T (fully zero-shifted taps), K=3 and K=1,
    values AND gradients."""
    import pytorch_video_action_tpu.ops.conv as conv_mod

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    for k in (3, 1):
        p = {
            "w": jnp.asarray(rng.normal(size=(k, 16, 24)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(24,)).astype(np.float32)),
        }

        def loss(p, x, taps):
            conv_mod.CONV_TAPS = taps
            try:
                return (conv_mod.conv1d(p, x, dilation) ** 2).sum()
            finally:
                conv_mod.CONV_TAPS = True

        conv_mod.CONV_TAPS = True
        a = np.asarray(conv_mod.conv1d(p, x, dilation))
        conv_mod.CONV_TAPS = False
        b = np.asarray(conv_mod.conv1d(p, x, dilation))
        conv_mod.CONV_TAPS = True
        np.testing.assert_allclose(a, b, atol=3e-5, rtol=1e-5)

        ga = jax.grad(loss, argnums=(0, 1))(p, x, True)
        gb = jax.grad(loss, argnums=(0, 1))(p, x, False)
        for la, lb in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("dilation", [1, 2, 16, 63, 64, 200])
def test_conv_pack_bwd_matches_autodiff(dilation):
    """PACK_BWD custom VJP (ops/conv.py _tap3_packed — all three tap dWs in
    one [3C,B*T]@[B*T,C'] dot, dx in one [B*T,C']@[C',3C] dot) computes the
    same sums per grad element as autodiff of the per-tap form, for every
    dilation class incl. d >= T (center-tap short circuit)."""
    import pytorch_video_action_tpu.ops.conv as conv_mod

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    p = {
        "w": jnp.asarray(rng.normal(size=(3, 16, 24)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(24,)).astype(np.float32)),
    }
    co = jnp.asarray(rng.normal(size=(2, 64, 24)).astype(np.float32))

    def loss_packed(p, x):
        return (conv_mod._tap3_packed(dilation, p["w"], p["b"], x) * co).sum()

    def loss_plain(p, x):
        return (conv_mod._tap3_value(dilation, p["w"], p["b"], x) * co).sum()

    va = loss_packed(p, x)
    vb = loss_plain(p, x)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-6)
    ga = jax.grad(loss_packed, argnums=(0, 1))(p, x)
    gb = jax.grad(loss_plain, argnums=(0, 1))(p, x)
    for la, lb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=1e-5, rtol=1e-5)
    # bf16 operands must also round-trip (the bench path casts params+x)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    xb = x.astype(jnp.bfloat16)
    gb16 = jax.grad(
        lambda p, x: conv_mod._tap3_packed(dilation, p["w"], p["b"], x)
        .astype(jnp.float32).sum(), argnums=(0, 1))(pb, xb)
    for leaf, ref in zip(jax.tree_util.tree_leaves(gb16),
                         jax.tree_util.tree_leaves(
                             (pb, xb))):
        assert leaf.dtype == ref.dtype
        assert bool(jnp.isfinite(leaf.astype(jnp.float32)).all())


def test_mstcn_remat_grads_match_default():
    """PVA_MSTCN_REMAT=layer/stage recomputes the backward from checkpoints;
    the counter-hash dropout masks regenerate bit-identically in the
    recompute, so grads must match the default save-everything backward
    exactly (the property that makes remat safe for memory-bound shapes;
    both variants measured slower at bench shapes and default off —
    docs/PERF_NOTES.md)."""
    import pytorch_video_action_tpu.models.mstcn as mm
    from pytorch_video_action_tpu.models.mstcn import MSTCNConfig, apply, init
    from pytorch_video_action_tpu.train.losses import make_loss_fn

    cfg = MSTCNConfig(n_class=6, num_stages=2, num_layers=3)
    params = init(jax.random.PRNGKey(0), cfg)
    loss = make_loss_fn("ms_tcn", 6)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 400)).astype(np.float32))
    lengths = jnp.asarray([32, 20], jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 6, size=(64,)))
    key = jax.random.PRNGKey(3)

    def lf(p):
        return loss(apply(p, cfg, x, lengths, train=True, rng=key), tgt)

    grads = {}
    try:
        for remat in ("none", "layer", "stage"):
            mm.REMAT = remat
            grads[remat] = jax.grad(lf)(params)
    finally:
        mm.REMAT = "none"
    for r in ("layer", "stage"):
        for la, lb in zip(jax.tree_util.tree_leaves(grads["none"]),
                          jax.tree_util.tree_leaves(grads[r])):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-5, rtol=1e-5)


def test_mstcn_packed_mask_training_acts_and_is_finite():
    """The PVA_PACKED_MASKS=1 escape hatch draws a different (byte-lane)
    mask stream: dropout must act, grads stay finite, and eval outputs are
    unaffected (masks only exist in train mode)."""
    import pytorch_video_action_tpu.ops.conv as cm
    from pytorch_video_action_tpu.models.mstcn import MSTCNConfig, apply, init
    from pytorch_video_action_tpu.train.losses import make_loss_fn

    cfg = MSTCNConfig(n_class=6, num_stages=2, num_layers=3)
    params = init(jax.random.PRNGKey(0), cfg)
    loss = make_loss_fn("ms_tcn", 6)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 400)).astype(np.float32))
    lengths = jnp.asarray([32, 20], jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 6, size=(64,)))
    key = jax.random.PRNGKey(3)

    def lf(p, packed):
        cm.PACKED_MASKS = packed
        try:
            return loss(apply(p, cfg, x, lengths, train=True, rng=key), tgt)
        finally:
            cm.PACKED_MASKS = False

    lw, gw = jax.value_and_grad(lambda p: lf(p, False))(params)
    lp, gp = jax.value_and_grad(lambda p: lf(p, True))(params)
    assert np.isfinite(float(lp)) and np.isfinite(float(lw))
    assert abs(float(lp) - float(lw)) > 1e-7  # different stream -> acted
    for leaf in jax.tree_util.tree_leaves(gp):
        assert np.isfinite(np.asarray(leaf)).all()
    # eval path identical regardless of the flag
    cm.PACKED_MASKS = True
    a = apply(params, cfg, x, lengths, train=False)
    cm.PACKED_MASKS = False
    b = apply(params, cfg, x, lengths, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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


# ===================================================== in-kernel hash dropout


def test_fused_dropout_matches_hash_reference():
    """Kernel train-mode dropout == the XLA hash-dropout oracle (same seeds):
    the backward recomputes through exactly this function, so forward/backward
    see the identical mask."""
    from pytorch_video_action_tpu.ops.conv_pallas import (
        fused_dilated_residual, hash_dropout_reference)

    layer = _conv_layer(3)
    x, mask = _conv_inputs(3)
    seeds = jnp.asarray([17, 4242], jnp.uint32)
    got = fused_dilated_residual(layer, x, mask, 4, dropout_rate=0.5,
                                 seeds=seeds)
    assert got is not None
    expect = hash_dropout_reference(layer, x, mask, 4, 0.5, seeds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=3e-5, rtol=1e-4)


def test_fused_dropout_mask_statistics():
    """Kernel applies exactly the hash keep-mask; the mask keeps ~keep
    fraction and is decorrelated across videos (distinct seeds)."""
    from pytorch_video_action_tpu.ops.conv_pallas import (
        _keep_mask, _threshold, fused_dilated_residual,
        hash_dropout_reference)

    keep = 0.5
    layer = _conv_layer(4)
    b, t, c = 2, 256, 64
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    mask = jnp.ones((b, t, 1), jnp.float32)
    seeds = jnp.asarray([1, 2], jnp.uint32)
    dropped = np.asarray(
        fused_dilated_residual(layer, x, mask, 2, dropout_rate=1 - keep,
                               seeds=seeds))
    clean = np.asarray(hash_dropout_reference(layer, x, mask, 2, 0.0, seeds))
    pre = clean - np.asarray(x)          # conv branch without dropout
    post = dropped - np.asarray(x)       # conv branch with dropout
    km = np.asarray(jax.vmap(
        lambda s: _keep_mask(s, t, c, _threshold(keep)))(seeds))
    np.testing.assert_allclose(post, np.where(km, pre / keep, 0.0),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(km.mean(axis=(1, 2)), keep, atol=0.05)
    # distinct seeds -> distinct masks
    assert 0.3 < (km[0] != km[1]).mean() < 0.7


def test_fused_dropout_grads_match_hash_reference():
    """Custom-VJP backward (XLA recompute with regenerated mask) == autodiff
    through the hash oracle, dropout ON."""
    from pytorch_video_action_tpu.ops.conv_pallas import (
        fused_dilated_residual, hash_dropout_reference)

    layer = _conv_layer(5)
    x, mask = _conv_inputs(5)
    seeds = jnp.asarray([7, 9], jnp.uint32)

    def loss_pallas(layer, x):
        return jnp.sum(
            fused_dilated_residual(layer, x, mask, 4, dropout_rate=0.5,
                                   seeds=seeds) ** 2)

    def loss_xla(layer, x):
        return jnp.sum(
            hash_dropout_reference(layer, x, mask, 4, 0.5, seeds) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(layer, x)
    gx = jax.grad(loss_xla, argnums=(0, 1))(layer, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_fused_bf16_eval_matches_xla():
    """bf16 inputs lower (store casts to out dtype) and match the XLA path at
    bf16 tolerance."""
    from pytorch_video_action_tpu.ops.conv import dilated_residual_layer
    from pytorch_video_action_tpu.ops.conv_pallas import fused_dilated_residual

    layer = _conv_layer(6)
    layer = jax.tree.map(lambda a: a.astype(jnp.bfloat16), layer)
    x, mask = _conv_inputs(6)
    x = x.astype(jnp.bfloat16)
    got = fused_dilated_residual(layer, x, mask.astype(jnp.bfloat16), 4)
    assert got is not None and got.dtype == jnp.bfloat16
    expect = dilated_residual_layer(layer, x, mask.astype(jnp.bfloat16),
                                    dilation=4, train=False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expect, np.float32),
        atol=0.05, rtol=0.05)


def test_mstcn_pallas_trains_with_dropout():
    """use_pallas is live in the real training config (dropout 0.5): the
    fused kernel handles the train step end-to-end with finite grads, and
    dropout is actually active (train forward != eval forward)."""
    from pytorch_video_action_tpu.models import mstcn

    cfg = mstcn.MSTCNConfig(dim=16, num_stages=2, num_layers=5, num_f_maps=64,
                            n_class=5, dropout_rate=0.5, use_pallas=True)
    params = mstcn.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 40, 16)).astype(np.float32))
    lengths = jnp.asarray(np.array([40, 23], np.int32))

    def loss(p, key):
        out = mstcn.apply(p, cfg, x, lengths, train=True, rng=key)
        return jnp.mean(out ** 2)

    k = jax.random.PRNGKey(1)
    l1, grads = jax.value_and_grad(loss)(params, k)
    assert np.isfinite(float(l1))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
    out_train = mstcn.apply(params, cfg, x, lengths, train=True, rng=k)
    out_eval = mstcn.apply(params, cfg, x, lengths, train=False)
    assert not np.allclose(np.asarray(out_train), np.asarray(out_eval))
    # reproducible: same key -> same masks -> same loss
    assert float(loss(params, k)) == float(l1)


# ========================================================== bf16 gates opt-in


def test_gru_bf16_gates_close_to_f32():
    """PVA_RNN_BF16_GATES=1: gate transcendentals in bf16, carry/matmuls f32.
    Output stays within bf16-nonlinearity tolerance of the f32 path and the
    recurrence does not drift over T (f32-carry guarantee); grads stay close
    and finite."""
    import pytorch_video_action_tpu.ops.rnn_pallas as rp

    xg, wh, bh, mask = _inputs(9)
    expect = np.asarray(rp.gru_scan(xg, wh, bh, mask))
    old = rp._BF16_GATES
    rp._BF16_GATES = True
    try:
        got = rp.gru_scan(xg, wh, bh, mask)
        assert got is not None
        # per-gate bf16 rounding is ~4e-3 relative; the f32 carry mix keeps
        # late-T error in the same band as early-T (no compounding blowup)
        err = np.abs(np.asarray(got) - expect)
        assert err.max() < 0.05
        assert err[T // 2:].max() < 2 * max(err[: T // 2].max(), 1e-3)

        def loss(xg, wh, bh):
            return jnp.sum(rp.gru_scan(xg, wh, bh, mask) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(xg, wh, bh)
    finally:
        rp._BF16_GATES = old
    gx = jax.grad(lambda a, b, c: jnp.sum(rp.gru_scan(a, b, c, mask) ** 2),
                  argnums=(0, 1, 2))(xg, wh, bh)
    for a, b in zip(grads, gx):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a))
        denom = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.05


# ======================================================= whole-stage fusion


def _stage_layers(n=6, seed=0, c=64):
    return [_conv_layer(seed * 100 + i, c) for i in range(n)]


def _xla_stage(layers, x, mask, dropout_rate=0.0, seeds=None):
    """Per-layer oracle chain (hash dropout when seeds given)."""
    from pytorch_video_action_tpu.ops.conv import dilated_residual_layer
    from pytorch_video_action_tpu.ops.conv_pallas import hash_dropout_reference

    t = x.shape[1]
    for i, l in enumerate(layers):
        d = min(2 ** i, t)
        if seeds is None:
            x = dilated_residual_layer(l, x, mask, dilation=d, train=False)
        else:
            x = hash_dropout_reference(l, x, mask, d, dropout_rate,
                                       seeds[:, i])
    return x


def test_fused_stage_matches_per_layer_chain():
    """Stage kernel == the per-layer XLA chain at eval (dilations 1..32
    including d >= T tap-vanishing levels)."""
    from pytorch_video_action_tpu.ops.conv_pallas import fused_stage

    layers = _stage_layers(7)  # d = 1..64 > T=48
    x, mask = _conv_inputs(3)
    got = fused_stage(layers, x, mask)
    assert got is not None
    expect = _xla_stage(layers, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=5e-5, rtol=1e-4)


def test_fused_stage_dropout_matches_hash_chain():
    from pytorch_video_action_tpu.ops.conv_pallas import fused_stage

    layers = _stage_layers(5, seed=1)
    x, mask = _conv_inputs(4)
    seeds = jnp.asarray(
        np.random.default_rng(5).integers(0, 2**32, size=(2, 5)), jnp.uint32)
    got = fused_stage(layers, x, mask, dropout_rate=0.5, seeds=seeds)
    assert got is not None
    expect = _xla_stage(layers, x, mask, 0.5, seeds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=5e-5, rtol=1e-4)


def test_fused_stage_grads_match_chain():
    """Custom-VJP backward (XLA chain recompute) == autodiff through the
    per-layer oracle."""
    from pytorch_video_action_tpu.ops.conv_pallas import fused_stage

    layers = _stage_layers(4, seed=2)
    x, mask = _conv_inputs(6)

    def loss_pallas(layers, x):
        return jnp.sum(fused_stage(layers, x, mask) ** 2)

    def loss_xla(layers, x):
        return jnp.sum(_xla_stage(layers, x, mask) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(layers, x)
    gx = jax.grad(loss_xla, argnums=(0, 1))(layers, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_mstcn_stage_fused_eval_matches_xla():
    """Full model: use_pallas eval (stage-fused path) == XLA model."""
    from pytorch_video_action_tpu.models import mstcn

    kw = dict(dim=16, num_stages=3, num_layers=6, num_f_maps=64, n_class=5,
              dropout_rate=0.5)
    cfg_x = mstcn.MSTCNConfig(**kw, use_pallas=False)
    cfg_p = mstcn.MSTCNConfig(**kw, use_pallas=True)
    params = mstcn.init(jax.random.PRNGKey(3), cfg_x)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 50, 16)).astype(np.float32))
    lengths = jnp.asarray(np.array([50, 31], np.int32))
    out_x = np.asarray(mstcn.apply(params, cfg_x, x, lengths, train=False))
    out_p = np.asarray(mstcn.apply(params, cfg_p, x, lengths, train=False))
    np.testing.assert_allclose(out_p, out_x, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("dilation", [1, 8, 199, 200, 4096])
@pytest.mark.parametrize("rate", [0.0, 0.5])
def test_conv_fused_bwd_matches_autodiff(monkeypatch, dilation, rate):
    """PVA_CONV_FUSED_BWD routes the train-time layer VJP through the
    single-pass Pallas backward (recompute-in-VMEM, per-video partial
    weight grads); values must be bit-identical to the XLA path (same
    forward) and every gradient must match autodiff across the dilation
    classes (d < T, d == T-1, d == T, d >> T)."""
    import pytorch_video_action_tpu.ops.conv as conv

    rng = np.random.default_rng(0)
    b, t, c = 3, 200, 64
    key = jax.random.PRNGKey(3)
    layer = {
        "conv_dilated": {
            "w": jnp.asarray(rng.normal(size=(3, c, c)).astype(np.float32))
            * 0.1,
            "b": jnp.asarray(rng.normal(size=(c,)).astype(np.float32)) * 0.1,
        },
        "conv_1x1": {
            "w": jnp.asarray(rng.normal(size=(1, c, c)).astype(np.float32))
            * 0.1,
            "b": jnp.asarray(rng.normal(size=(c,)).astype(np.float32)) * 0.1,
        },
    }
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    mask = (
        jnp.arange(t)[None, :, None]
        < jnp.asarray([150, 200, 90])[:, None, None]
    ).astype(jnp.float32)
    dy = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))

    def run(fused):
        monkeypatch.setenv("PVA_CONV_FUSED_BWD", "1" if fused else "0")

        def f(lay, xx):
            return conv.dilated_residual_layer(
                lay, xx, mask, dilation=dilation, dropout_rate=rate,
                train=True, rng=key,
            )

        out, vjp = jax.vjp(f, layer, x)
        return out, vjp(dy)

    o0, (gl0, gx0) = run(False)
    o1, (gl1, gx1) = run(True)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               atol=2e-4, rtol=1e-3)
    for a, bb in zip(jax.tree.leaves(gl0), jax.tree.leaves(gl1)):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   atol=2e-4, rtol=1e-3)


def test_conv_fused_bwd_bf16(monkeypatch):
    """bf16 params/inputs ride the fused backward with f32 accumulation;
    grads track the (bf16) autodiff path to bf16 tolerance."""
    import pytorch_video_action_tpu.ops.conv as conv

    rng = np.random.default_rng(1)
    b, t, c = 2, 128, 64
    key = jax.random.PRNGKey(5)
    mk = lambda *s: jnp.asarray(
        rng.normal(size=s).astype(np.float32) * 0.1, jnp.bfloat16)
    layer = {
        "conv_dilated": {"w": mk(3, c, c), "b": mk(c)},
        "conv_1x1": {"w": mk(1, c, c), "b": mk(c)},
    }
    x = mk(b, t, c) * 10
    mask = jnp.ones((b, t, 1), jnp.bfloat16)
    dy = mk(b, t, c) * 10

    def run(fused):
        monkeypatch.setenv("PVA_CONV_FUSED_BWD", "1" if fused else "0")

        def f(lay, xx):
            return conv.dilated_residual_layer(
                lay, xx, mask, dilation=4, dropout_rate=0.5,
                train=True, rng=key,
            )

        out, vjp = jax.vjp(f, layer, x)
        return out, vjp(dy)

    o0, (gl0, gx0) = run(False)
    o1, (gl1, gx1) = run(True)
    assert o1.dtype == jnp.bfloat16

    # f32 oracle: the kernel accumulates grads in f32 while bf16 autodiff
    # rounds at every intermediate, so compare BOTH to the f32 truth and
    # require the fused path to be no less accurate than autodiff
    layer32 = jax.tree.map(lambda a: a.astype(jnp.float32), layer)
    x32 = x.astype(jnp.float32)
    monkeypatch.setenv("PVA_CONV_FUSED_BWD", "0")

    def f32_fn(lay, xx):
        return conv.dilated_residual_layer(
            lay, xx, mask.astype(jnp.float32), dilation=4, dropout_rate=0.5,
            train=True, rng=key,
        )

    _, vjp32 = jax.vjp(f32_fn, layer32, x32)
    glo, gxo = vjp32(dy.astype(jnp.float32))

    def err(got, oracle):
        return float(jnp.abs(jnp.asarray(got, jnp.float32)
                             - jnp.asarray(oracle, jnp.float32)).max())

    assert err(gx1, gxo) <= err(gx0, gxo) * 1.5 + 1e-3
    for a0, a1, ao in zip(jax.tree.leaves(gl0), jax.tree.leaves(gl1),
                          jax.tree.leaves(glo)):
        assert err(a1, ao) <= err(a0, ao) * 1.5 + 1e-3
