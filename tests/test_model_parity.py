"""Numerical parity: each JAX model vs. the reference PyTorch implementation.

The reference repo (read-only at /root/reference) is imported as an *oracle*:
we build its nn.Modules, export their state_dicts into our pytree layout via
``torch_compat.import_torch_state_dict``, and compare eval-mode outputs on
fixed random inputs.  Skipped when the reference tree is unavailable.
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
    import_torch_state_dict,
)

N_CLASS = 6
B, T, D = 3, 17, 400


def _inputs(equal_lengths=False, t=T, b=B, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, size=(b, t, D)).astype(np.float32)
    if equal_lengths:
        lengths = np.full((b,), t, dtype=np.int32)
    else:
        lengths = np.array([t, t - 4, t - 9][:b], dtype=np.int32)
    for i, l in enumerate(lengths):
        x[i, l:] = 0.0
    return x, lengths


def _compare(model_name, torch_net, jax_def, x, lengths, atol=2e-4, torch_takes_len=True):
    torch_net.eval()
    params = import_torch_state_dict(model_name, jax_def.config, torch_net.state_dict())
    with torch.no_grad():
        if torch_takes_len:
            ref_out = torch_net(torch.tensor(x), list(map(int, lengths))).numpy()
        else:
            ref_out = torch_net(torch.tensor(x)).numpy()
    out = jax_def.apply(params, jnp.asarray(x), jnp.asarray(lengths), train=False)
    out = np.asarray(out).reshape(ref_out.shape)
    np.testing.assert_allclose(out, ref_out, atol=atol, rtol=1e-3)


def test_simple_fc_parity():
    x, lengths = _inputs()
    net = ref_nets.SimpleFC(D, N_CLASS)
    jd = build_model("simple_fc", N_CLASS)
    _compare("simple_fc", net, jd, x, lengths, torch_takes_len=False)


@pytest.mark.parametrize("mode", ["cont", "last"])
def test_vanilla_lstm_parity(mode):
    x, lengths = _inputs(equal_lengths=(mode == "last"))
    net = ref_nets.vanillaLSTM(D, lstm_layer=2, hidden_dim=32, n_class=N_CLASS, mode=mode)
    jd = build_model(
        "vanilla_lstm", N_CLASS, pred_mode=mode, lstm_layer=2, lstm_hidden1=32
    )
    _compare("vanilla_lstm", net, jd, x, lengths)


def test_vanilla_lstm_variable_lengths():
    # padded rows: both sides emit log_softmax(bias) at invalid frames
    x, lengths = _inputs(equal_lengths=False)
    net = ref_nets.vanillaLSTM(D, lstm_layer=1, hidden_dim=32, n_class=N_CLASS)
    jd = build_model("vanilla_lstm", N_CLASS, lstm_layer=1, lstm_hidden1=32)
    _compare("vanilla_lstm", net, jd, x, lengths)


@pytest.mark.parametrize("mode", ["cont", "avg", "last"])
def test_bilstm_parity(mode):
    # avg/last parity requires equal lengths (reference pools over padded rows)
    x, lengths = _inputs(equal_lengths=(mode in ("avg", "last")))
    net = ref_nets.BiLSTM(
        D, lstm_layer=2, hidden_dim_1=64, hidden_dim_2=32, n_class=N_CLASS, mode=mode
    )
    jd = build_model(
        "bilstm", N_CLASS, pred_mode=mode, lstm_layer=2, lstm_hidden1=64, lstm_hidden2=32
    )
    _compare("bilstm", net, jd, x, lengths)


def test_bilstm_lm_parity_eval():
    """Weight-for-weight oracle parity for the stateful BiLSTMWithLM
    (``networks.py:89-141``) at batch 1 — the only batch size where the
    reference's flattened-row context loop is self-consistent (its
    ``reset_idx = cumsum(x_len)`` never fires within a single video, so the
    zero-initialized buffer IS the per-video zero context we scan with)."""
    x, lengths = _inputs(equal_lengths=True, b=1)
    net = ref_nets.BiLSTMWithLM(
        D, lstm_layer=2, hidden_dim_1=64, hidden_dim_2=32, n_class=N_CLASS,
        dropout_rate=0.0,
    )
    net.eval()
    jd = build_model(
        "bilstm_lm", N_CLASS, lstm_layer=2, lstm_hidden1=64, lstm_hidden2=32,
        lstm_dropout=0.0,
    )
    params, state = import_torch_state_dict("bilstm_lm", jd.config, net.state_dict())
    with torch.no_grad():
        ref_out = net(torch.tensor(x), list(map(int, lengths))).numpy()
    out, _ = jd.apply(
        params, jnp.asarray(x), jnp.asarray(lengths), train=False, state=state
    )
    out = np.asarray(out).reshape(ref_out.shape)
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


def test_bilstm_lm_parity_train_batchnorm_stats():
    """Train-mode parity: outputs AND the BatchNorm running-stat updates
    (momentum 0.1, unbiased running var — ``nn.BatchNorm1d`` semantics) must
    match the oracle after one forward (dropout disabled for determinism)."""
    x, lengths = _inputs(equal_lengths=True, b=1, seed=7)
    net = ref_nets.BiLSTMWithLM(
        D, lstm_layer=2, hidden_dim_1=64, hidden_dim_2=32, n_class=N_CLASS,
        dropout_rate=0.0,
    )
    jd = build_model(
        "bilstm_lm", N_CLASS, lstm_layer=2, lstm_hidden1=64, lstm_hidden2=32,
        lstm_dropout=0.0,
    )
    params, state = import_torch_state_dict("bilstm_lm", jd.config, net.state_dict())
    net.train()
    with torch.no_grad():
        ref_out = net(torch.tensor(x), list(map(int, lengths))).numpy()
    out, new_state = jd.apply(
        params, jnp.asarray(x), jnp.asarray(lengths), train=True, rng=None,
        state=state,
    )
    out = np.asarray(out).reshape(ref_out.shape)
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)
    for bn, mod in (("bn1", net.batch_norm_1), ("bn2", net.batch_norm_2)):
        np.testing.assert_allclose(
            np.asarray(new_state[bn]["mean"]), mod.running_mean.numpy(),
            atol=1e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(new_state[bn]["var"]), mod.running_var.numpy(),
            atol=1e-5, rtol=1e-4,
        )


def test_bigru_parity():
    x, lengths = _inputs()
    net = ref_nets.BiGRU(D, n_class=N_CLASS)
    jd = build_model("bigru", N_CLASS)
    _compare("bigru", net, jd, x, lengths, atol=5e-4)


def test_attn_parity():
    # reference attends over padding; compare on full-length batch
    x, lengths = _inputs(equal_lengths=True)
    net = ref_nets.MultiHeadAttention(D, 4, n_class=N_CLASS, mode="cont")
    jd = build_model("attn", N_CLASS, attn_head=4)
    _compare("attn", net, jd, x, lengths, atol=5e-4)


@pytest.mark.parametrize("mode", ["avg", "last"])
def test_attn_masked_pooling_padding_invariant(mode):
    """Documented deviation (README): attn's avg/last pooling masks padded
    rows (the reference pools over them, ``networks.py:195-198``), so the
    pooled output of a ragged batch must equal each video evaluated alone at
    its exact length."""
    x, lengths = _inputs(equal_lengths=False)
    jd = build_model("attn", N_CLASS, attn_head=4, pred_mode=mode)
    params = jd.init(jax.random.PRNGKey(0))
    batched = np.asarray(
        jd.apply(params, jnp.asarray(x), jnp.asarray(lengths), train=False)
    )
    for i, l in enumerate(lengths):
        solo = np.asarray(
            jd.apply(
                params,
                jnp.asarray(x[i : i + 1, :l]),
                jnp.asarray([l]),
                train=False,
            )
        )
        np.testing.assert_allclose(batched[i], solo[0], atol=1e-5, rtol=1e-5)


def test_win_attn_parity():
    # mask_padding=False reproduces the reference exactly (it attends its
    # zero-pad tail, networks.py:221); the default masks past `lengths`
    x, lengths = _inputs(equal_lengths=True, t=23)
    net = ref_nets.ExpWindowAttention(D, 4, n_class=N_CLASS)
    jd = build_model("win_attn", N_CLASS, attn_head=4,
                     cfg_overrides={"mask_padding": False})
    _compare("win_attn", net, jd, x, lengths, atol=5e-4)


def test_win_attn_bucket_padding_invariance():
    """Default (mask_padding=True): outputs on valid rows are invariant to
    bucket rounding — padding a ragged batch out to a larger bucket multiple
    must not change any valid-frame score (VERDICT r3 weak-item 8)."""
    rng = np.random.default_rng(11)
    b, t_exact, pad_to = 2, 23, 64  # bucket-rounded shape >> exact
    x = rng.normal(size=(b, t_exact, D)).astype(np.float32)
    lengths = np.array([23, 17], np.int64)
    x[1, 17:] = 0.0
    jd = build_model("win_attn", N_CLASS, attn_head=4)
    params = jd.init(jax.random.PRNGKey(0))
    out_exact = np.asarray(
        jd.apply(params, jnp.asarray(x), jnp.asarray(lengths), train=False)
    ).reshape(b, t_exact, N_CLASS)
    xp = np.zeros((b, pad_to, D), np.float32)
    xp[:, :t_exact] = x
    out_pad = np.asarray(
        jd.apply(params, jnp.asarray(xp), jnp.asarray(lengths), train=False)
    ).reshape(b, pad_to, N_CLASS)
    # compare rows that received a window score in BOTH shapes: centers are
    # w, 2w, ... so the padded run scores MORE rows; every row scored in the
    # exact run must agree on valid frames
    w = 5  # WinAttnConfig.window_size default
    for i, l in enumerate(lengths):
        for f in range(w, t_exact, w):
            row = f - w
            if row < l:
                np.testing.assert_allclose(
                    out_pad[i, row], out_exact[i, row], atol=1e-5, rtol=1e-5)


def test_mstcn_parity():
    x, lengths = _inputs(equal_lengths=False, t=33)
    net = ref_nets.MultiStageModel(D, n_class=N_CLASS)
    jd = build_model("ms_tcn", N_CLASS)
    net.eval()
    params = import_torch_state_dict("ms_tcn", jd.config, net.state_dict())
    with torch.no_grad():
        ref_out = net(torch.tensor(x), list(map(int, lengths))).numpy()
    out = jax_out = jd.apply(params, jnp.asarray(x), jnp.asarray(lengths), train=False)
    out = np.asarray(out).reshape(ref_out.shape)
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


def test_ctc_loss_parity():
    from pytorch_video_action_tpu.train.losses import ctc_loss, prepare_ctc_targets

    rng = np.random.default_rng(0)
    b, t, k = 2, 12, N_CLASS + 1
    logits = rng.normal(0, 1, size=(b, t, k)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = np.array(
        [[1, 1, 2, 2, 3, 3, 3, 1, 1, 1, -1, -1], [2, 2, 2, 4, 4, 4, 4, 4, 5, 5, 5, 5]]
    )
    input_lengths = np.array([10, 12], dtype=np.int32)
    targets, target_lengths = prepare_ctc_targets(labels.reshape(-1), b)

    ours = float(
        ctc_loss(
            log_probs,
            jnp.asarray(input_lengths),
            jnp.asarray(targets),
            jnp.asarray(target_lengths),
            blank_id=N_CLASS,
        )
    )
    crit = torch.nn.CTCLoss(blank=N_CLASS, zero_infinity=True)
    tl = torch.tensor(np.asarray(log_probs)).permute(1, 0, 2)
    flat_targets = torch.tensor(
        np.concatenate([targets[i, : target_lengths[i]] for i in range(b)])
    )
    ref = float(
        crit(tl, flat_targets, torch.tensor(input_lengths), torch.tensor(target_lengths))
    )
    assert abs(ours - ref) < 1e-3


def test_nll_loss_parity():
    from pytorch_video_action_tpu.train.losses import nll_loss

    rng = np.random.default_rng(0)
    n, c = 20, N_CLASS
    logp = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(n, c)).astype(np.float32)))
    targets = rng.integers(0, c, size=n)
    targets[::4] = -1
    ours = float(nll_loss(logp, jnp.asarray(targets)))
    crit = torch.nn.NLLLoss(ignore_index=-1)
    ref = float(crit(torch.tensor(np.asarray(logp)), torch.tensor(targets)))
    assert abs(ours - ref) < 1e-5


def test_blockwise_attention_matches_dense():
    """Long-sequence eval path (online-softmax KV chunks) == dense MHA."""
    import jax
    import jax.numpy as jnp

    from pytorch_video_action_tpu.models import attention as A

    e, heads, b, t = 16, 4, 2, 1536  # t >= BLOCKWISE_MIN_T triggers blockwise
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(b, t, e)).astype(np.float32))
    lengths = np.array([1536, 700], np.int32)
    mask = jnp.asarray(np.arange(t)[None, :] < lengths[:, None])
    p = A.init_mha(jax.random.PRNGKey(0), e)

    blockwise = np.asarray(
        A.mha_self_attention(p, x, heads, key_mask=mask)  # t>=min -> blockwise
    )
    # force the dense path by lowering the threshold temporarily
    orig = A.BLOCKWISE_MIN_T
    A.BLOCKWISE_MIN_T = 10**9
    try:
        dense = np.asarray(A.mha_self_attention(p, x, heads, key_mask=mask))
    finally:
        A.BLOCKWISE_MIN_T = orig
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(blockwise[i, :l], dense[i, :l],
                                   atol=3e-5, rtol=1e-4)
