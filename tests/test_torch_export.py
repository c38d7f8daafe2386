"""Export direction of the torch bridge: our params -> reference state_dict.

The inverse of the import-parity suite (``test_model_parity.py``): start from
OUR randomly-initialized params, ``export_torch_state_dict`` them, strict-load
the result into the reference ``networks.py`` module, and require forward
agreement — proving a TPU-trained checkpoint can be handed to the upstream
torch scripts unchanged (``/root/reference/train.py:263-264``,
``inference.py:97-98``).  Plus exact export->import round-trips and the
``export_pth.py`` CLI end-to-end.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    import networks as ref_nets  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pytorch_video_action_tpu.models import build_model  # noqa: E402
from pytorch_video_action_tpu.models.torch_compat import (  # noqa: E402
    export_torch_state_dict,
    import_torch_state_dict,
)

N_CLASS = 6
B, T, D = 3, 17, 400


def _inputs(equal_lengths=True, t=T, b=B, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, size=(b, t, D)).astype(np.float32)
    if equal_lengths:
        lengths = np.full((b,), t, dtype=np.int32)
    else:
        lengths = np.array([t, t - 4, t - 9][:b], dtype=np.int32)
    for i, l in enumerate(lengths):
        x[i, l:] = 0.0
    return x, lengths


def _strict_load(net, sd):
    net.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                        strict=True)
    net.eval()


def _export_and_compare(model_name, jd, torch_net, x, lengths, *, state=None,
                        atol=5e-4, torch_takes_len=True):
    """Our params -> exported sd -> strict torch load -> forward agreement."""
    sd = export_torch_state_dict(model_name, jd_params(jd), state=state)
    _strict_load(torch_net, sd)
    with torch.no_grad():
        if torch_takes_len:
            ref_out = torch_net(torch.tensor(x), list(map(int, lengths))).numpy()
        else:
            ref_out = torch_net(torch.tensor(x)).numpy()
    kw = {"state": state} if state is not None else {}
    out = jd.apply(jd_params(jd), jnp.asarray(x), jnp.asarray(lengths),
                   train=False, **kw)
    if state is not None:
        out = out[0]
    out = np.asarray(out).reshape(ref_out.shape)
    np.testing.assert_allclose(out, ref_out, atol=atol, rtol=1e-3)


# Keyed by id(jd) BUT the value also pins the jd object itself: without
# that, a GC'd model from an earlier test can have its id() reused by a new
# build_model(...) under full-suite memory churn, silently returning the
# wrong family's params (seen as KeyError 'attention'/'stages' in export).
_PARAMS_CACHE = {}


def jd_params(jd):
    key = id(jd)
    if key not in _PARAMS_CACHE or _PARAMS_CACHE[key][0] is not jd:
        init = jd.init(jax.random.PRNGKey(42))
        _PARAMS_CACHE[key] = (jd, init[0] if jd.stateful else init)
    return _PARAMS_CACHE[key][1]


def _roundtrip(model_name, jd, params, state=None):
    """export -> import must reproduce the tree exactly (f32 bit-identical)."""
    sd = export_torch_state_dict(model_name, params, state=state)
    back = import_torch_state_dict(model_name, jd.config, sd)
    if state is not None:
        back, back_state = back
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            state, back_state,
        )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, back,
    )


def test_simple_fc_export():
    x, lengths = _inputs()
    jd = build_model("simple_fc", N_CLASS)
    net = ref_nets.SimpleFC(D, N_CLASS)
    _export_and_compare("simple_fc", jd, net, x, lengths, torch_takes_len=False)
    _roundtrip("simple_fc", jd, jd_params(jd))


def test_vanilla_lstm_export():
    x, lengths = _inputs()
    jd = build_model("vanilla_lstm", N_CLASS, lstm_layer=2, lstm_hidden1=32)
    net = ref_nets.vanillaLSTM(D, lstm_layer=2, hidden_dim=32, n_class=N_CLASS)
    _export_and_compare("vanilla_lstm", jd, net, x, lengths)
    _roundtrip("vanilla_lstm", jd, jd_params(jd))


def test_bilstm_export():
    x, lengths = _inputs()
    jd = build_model("bilstm", N_CLASS, lstm_layer=2, lstm_hidden1=64,
                     lstm_hidden2=32)
    net = ref_nets.BiLSTM(D, lstm_layer=2, hidden_dim_1=64, hidden_dim_2=32,
                          n_class=N_CLASS)
    _export_and_compare("bilstm", jd, net, x, lengths)
    _roundtrip("bilstm", jd, jd_params(jd))


def test_bilstm_lm_export():
    x, lengths = _inputs(b=1)
    jd = build_model("bilstm_lm", N_CLASS, lstm_layer=2, lstm_hidden1=64,
                     lstm_hidden2=32, lstm_dropout=0.0)
    params, state = jd.init(jax.random.PRNGKey(42))
    _PARAMS_CACHE[id(jd)] = (jd, params)
    net = ref_nets.BiLSTMWithLM(D, lstm_layer=2, hidden_dim_1=64,
                                hidden_dim_2=32, n_class=N_CLASS,
                                dropout_rate=0.0)
    _export_and_compare("bilstm_lm", jd, net, x, lengths, state=state)
    _roundtrip("bilstm_lm", jd, params, state=state)


def test_bilstm_lm_export_requires_state():
    jd = build_model("bilstm_lm", N_CLASS)
    params, _ = jd.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="BatchNorm state"):
        export_torch_state_dict("bilstm_lm", params)


def test_bigru_export():
    x, lengths = _inputs()
    jd = build_model("bigru", N_CLASS)
    net = ref_nets.BiGRU(D, n_class=N_CLASS)
    _export_and_compare("bigru", jd, net, x, lengths)
    _roundtrip("bigru", jd, jd_params(jd))


def test_attn_export():
    x, lengths = _inputs()
    jd = build_model("attn", N_CLASS, attn_head=4)
    net = ref_nets.MultiHeadAttention(D, 4, n_class=N_CLASS, mode="cont")
    _export_and_compare("attn", jd, net, x, lengths)
    _roundtrip("attn", jd, jd_params(jd))


def test_win_attn_export():
    x, lengths = _inputs(t=23)
    # mask_padding=False reproduces the reference (it attends its pad tail)
    jd = build_model("win_attn", N_CLASS, attn_head=4,
                     cfg_overrides={"mask_padding": False})
    net = ref_nets.ExpWindowAttention(D, 4, n_class=N_CLASS)
    _export_and_compare("win_attn", jd, net, x, lengths)
    _roundtrip("win_attn", jd, jd_params(jd))


def test_mstcn_export():
    x, lengths = _inputs(equal_lengths=False, t=33)
    jd = build_model("ms_tcn", N_CLASS)
    net = ref_nets.MultiStageModel(D, n_class=N_CLASS)
    _export_and_compare("ms_tcn", jd, net, x, lengths)
    _roundtrip("ms_tcn", jd, jd_params(jd))


def test_export_pth_cli_end_to_end(tmp_path):
    """save_params npz -> export_pth CLI -> torch.load strict-loads and the
    reference net reproduces our forward."""
    from pytorch_video_action_tpu.cli.export_pth_cli import main as export_main
    from pytorch_video_action_tpu.train.checkpoint import save_params

    x, lengths = _inputs()
    jd = build_model("bigru", N_CLASS)
    params = jd.init(jax.random.PRNGKey(1))
    ckpt = tmp_path / "bigru_0.74_dev.npz"
    save_params(str(ckpt), params)

    out_path = export_main([str(ckpt)])
    assert out_path == str(tmp_path / "bigru_0.74_dev.pth")
    sd = torch.load(out_path)
    net = ref_nets.BiGRU(D, n_class=N_CLASS)
    net.load_state_dict(sd, strict=True)
    net.eval()
    with torch.no_grad():
        ref_out = net(torch.tensor(x), list(map(int, lengths))).numpy()
    ours = np.asarray(
        jd.apply(params, jnp.asarray(x), jnp.asarray(lengths), train=False)
    ).reshape(ref_out.shape)
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=1e-3)
