"""Frame-pair lane packing (PVA_MSTCN_PACK2) equivalence vs the unpacked path.

The packed stage must be the unpacked stage reshaped: same values, same
dropout zeros (the fmix32 stream hashes linear element indices, which pack2
preserves), same grads.  Reference ops: networks.py:323-347.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_video_action_tpu.models import mstcn
from pytorch_video_action_tpu.ops import conv as conv_mod
from pytorch_video_action_tpu.ops.conv import (
    _tap3_value,
    conv1x1_pack2,
    dilated_residual_layer,
    dilated_residual_layer_pack2,
    init_conv1d,
    pack2,
    unpack2,
)


@pytest.mark.parametrize("d", [1, 2, 3, 4, 5, 8, 64, 100, 200])
def test_tap3_pack2_matches_unpacked(d):
    rng = np.random.default_rng(d)
    b, t, c = 2, 100, 8
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, c, c)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    ref = _tap3_value(d, w, bias, x)
    got = unpack2(conv_mod.tap3_pack2(d, w, bias, pack2(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("d", [1, 2, 3, 64, 200])
def test_tap3_pack2_grads_match(d):
    rng = np.random.default_rng(100 + d)
    b, t, c = 2, 64, 8
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, c, c)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))

    def f_ref(w, bias, x):
        return jnp.sum(jnp.sin(_tap3_value(d, w, bias, x)))

    def f_pk(w, bias, x):
        return jnp.sum(jnp.sin(unpack2(conv_mod.tap3_pack2(d, w, bias, pack2(x)))))

    gr = jax.grad(f_ref, argnums=(0, 1, 2))(w, bias, x)
    gp = jax.grad(f_pk, argnums=(0, 1, 2))(w, bias, x)
    for a, b_ in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("train", [False, True])
def test_residual_layer_pack2_matches(train):
    rng = np.random.default_rng(7)
    b, t, c = 2, 128, 8
    layer = {
        "conv_dilated": init_conv1d(jax.random.PRNGKey(0), c, c, 3),
        "conv_1x1": init_conv1d(jax.random.PRNGKey(1), c, c, 1),
    }
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    lengths = jnp.asarray([t, t - 37])
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)[:, :, None]
    maskp = jnp.repeat(mask.reshape(b, t // 2, 2), c, axis=-1)
    key = jax.random.PRNGKey(3)
    ref = dilated_residual_layer(layer, x, mask, dilation=2,
                                 dropout_rate=0.5, train=train, rng=key)
    got = unpack2(dilated_residual_layer_pack2(
        layer, pack2(x), maskp, dilation=2, dropout_rate=0.5,
        train=train, rng=key))
    # dropout zeros land in identical places (same hash stream)
    np.testing.assert_array_equal(np.asarray(got) == 0, np.asarray(ref) == 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def _mk_model_inputs(t=64):
    rng = np.random.default_rng(11)
    cfg = mstcn.MSTCNConfig(dim=12, num_stages=2, num_layers=4,
                            num_f_maps=8, n_class=5)
    params = mstcn.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, t, 12)).astype(np.float32))
    lengths = jnp.asarray([t, t - 9])
    return cfg, params, x, lengths


@pytest.mark.parametrize("train", [False, True])
def test_model_pack2_matches_unpacked(train, monkeypatch):
    cfg, params, x, lengths = _mk_model_inputs()
    key = jax.random.PRNGKey(5)

    def run():
        return mstcn.apply(params, cfg, x, lengths, train=train,
                           rng=key if train else None)

    monkeypatch.setattr(conv_mod, "PACK2", False)
    ref = run()
    monkeypatch.setattr(conv_mod, "PACK2", True)
    got = run()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_model_pack2_grads_match(monkeypatch):
    cfg, params, x, lengths = _mk_model_inputs()
    key = jax.random.PRNGKey(9)

    def loss(p):
        out = mstcn.apply(p, cfg, x, lengths, train=True, rng=key)
        return jnp.mean(out ** 2)

    monkeypatch.setattr(conv_mod, "PACK2", False)
    gr = jax.grad(loss)(params)
    monkeypatch.setattr(conv_mod, "PACK2", True)
    gp = jax.grad(loss)(params)
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    flat_p, _ = jax.tree_util.tree_flatten(gp)
    for a, b_ in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_model_pack2_odd_t_falls_back(monkeypatch):
    cfg, params, x, lengths = _mk_model_inputs(t=63)
    monkeypatch.setattr(conv_mod, "PACK2", True)
    out = mstcn.apply(params, cfg, x, lengths, train=False)
    monkeypatch.setattr(conv_mod, "PACK2", False)
    ref = mstcn.apply(params, cfg, x, lengths, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
