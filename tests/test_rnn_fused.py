"""Fused bidirectional GRU layer kernel (``ops/rnn_fused_pallas.py``):
values + grads vs the XLA bidir path, ragged lengths, bf16, and the
model-level bigru forward.

The kernel replaces ``masked_reverse`` gathers with reversed block index
maps + a carry freeze, and moves the input projection in-kernel — these
tests pin that all of it is semantics-preserving (reference:
``torch.nn.GRU(bidirectional=True)`` via ``networks.py:143-167``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_video_action_tpu.ops import rnn as R
from pytorch_video_action_tpu.ops import rnn_fused_pallas as F

# both fused step-body variants must match the XLA path (merged =
# block-diagonal [2H, g*2H] hidden matmul; split = two dense per-direction
# [H, gH] matmuls, torch weight layouts end-to-end)
SPLIT_VARIANTS = pytest.mark.parametrize("split", [False, True],
                                         ids=["merged", "split"])


def _mk(b=8, t=64, d=16, h=128, seed=0):
    rng = jax.random.PRNGKey(seed)
    layers = R.init_rnn(rng, d, h, 1, bidirectional=True, n_gates=3)
    x = jnp.asarray(
        np.random.default_rng(seed).normal(size=(b, t, d)).astype(np.float32))
    lengths = jnp.asarray(
        np.linspace(t // 3, t, b).astype(np.int32))  # ragged incl. full
    return layers[0], x, lengths


def _run(layer, x, lengths, h, use_pallas, split=False):
    orig, orig_split = R.USE_PALLAS, F.SPLIT
    R.USE_PALLAS = use_pallas
    F.SPLIT = split
    try:
        mask = R.length_mask(lengths, x.shape[1])
        return R._run_bidir_fused("gru", layer, x, lengths, mask, h)
    finally:
        R.USE_PALLAS, F.SPLIT = orig, orig_split


@SPLIT_VARIANTS
def test_fused_layer_matches_xla_values(split):
    layer, x, lengths = _mk()
    out_k = _run(layer, x, lengths, 128, True, split)
    out_x = _run(layer, x, lengths, 128, False)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), atol=2e-5, rtol=1e-4)


@SPLIT_VARIANTS
def test_fused_layer_matches_xla_grads(split):
    layer, x, lengths = _mk(seed=3)
    w = jnp.asarray(
        np.random.default_rng(9).normal(size=(8, 64, 256)).astype(np.float32))
    w = w * R.length_mask(lengths, 64).astype(jnp.float32)[:, :, None]

    def loss(layer, x, use_pallas):
        return jnp.sum(_run(layer, x, lengths, 128, use_pallas, split) * w)

    lk, gk = jax.value_and_grad(loss, argnums=(0, 1))(layer, x, True)
    lx, gx = jax.value_and_grad(loss, argnums=(0, 1))(layer, x, False)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    flat_k, _ = jax.tree.flatten(gk)
    flat_x, _ = jax.tree.flatten(gx)
    for a, b_ in zip(flat_k, flat_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=2e-4)


def test_fused_layer_bf16_close_to_f32():
    layer, x, lengths = _mk(seed=5)
    out_f32 = _run(layer, x, lengths, 128, True)
    layer16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), layer)
    out_bf16 = _run(layer16, x.astype(jnp.bfloat16), lengths, 128, True)
    assert out_bf16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_bf16, np.float32), np.asarray(out_f32),
        atol=5e-2, rtol=5e-2)


@SPLIT_VARIANTS
def test_fused_layer_small_batch_padded_exact(split):
    # b % 8 != 0 -> the kernel path pads the batch to 8 with lengths=0 rows
    # (inert through the carry freeze) and slices back — values must equal
    # the XLA path exactly
    layer, x, lengths = _mk(b=6, seed=7)
    out = _run(layer, x, lengths, 128, True, split)
    out_x = _run(layer, x, lengths, 128, False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_x), atol=2e-5, rtol=1e-4)
    # grads too (incl. weight grads — pad rows must contribute zero)
    w = jnp.asarray(
        np.random.default_rng(23).normal(size=out.shape).astype(np.float32))
    w = w * R.length_mask(lengths, x.shape[1]).astype(jnp.float32)[:, :, None]

    def loss(layer, use_pallas):
        return jnp.sum(_run(layer, x, lengths, 128, use_pallas, split) * w)

    gk = jax.grad(lambda p: loss(p, True))(layer)
    gx = jax.grad(lambda p: loss(p, False))(layer)
    for a, b_ in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=2e-4)


def _mk_lstm(b=8, t=64, d=16, h=128, seed=0):
    rng = jax.random.PRNGKey(seed)
    layers = R.init_rnn(rng, d, h, 1, bidirectional=True, n_gates=4)
    x = jnp.asarray(
        np.random.default_rng(seed).normal(size=(b, t, d)).astype(np.float32))
    lengths = jnp.asarray(np.linspace(t // 3, t, b).astype(np.int32))
    return layers[0], x, lengths


def _run_lstm(layer, x, lengths, h, use_pallas, split=False):
    orig, orig_split = R.USE_PALLAS, F.SPLIT
    R.USE_PALLAS = use_pallas
    F.SPLIT = split
    try:
        mask = R.length_mask(lengths, x.shape[1])
        return R._run_bidir_fused("lstm", layer, x, lengths, mask, h)
    finally:
        R.USE_PALLAS, F.SPLIT = orig, orig_split


@SPLIT_VARIANTS
def test_fused_lstm_layer_matches_xla_values(split):
    layer, x, lengths = _mk_lstm(seed=13)
    out_k = _run_lstm(layer, x, lengths, 128, True, split)
    out_x = _run_lstm(layer, x, lengths, 128, False)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), atol=2e-5, rtol=1e-4)


@SPLIT_VARIANTS
def test_fused_lstm_layer_matches_xla_grads(split):
    layer, x, lengths = _mk_lstm(seed=17)
    w = jnp.asarray(
        np.random.default_rng(19).normal(size=(8, 64, 256)).astype(np.float32))
    w = w * R.length_mask(lengths, 64).astype(jnp.float32)[:, :, None]

    def loss(layer, x, use_pallas):
        return jnp.sum(_run_lstm(layer, x, lengths, 128, use_pallas, split) * w)

    lk, gk = jax.value_and_grad(loss, argnums=(0, 1))(layer, x, True)
    lx, gx = jax.value_and_grad(loss, argnums=(0, 1))(layer, x, False)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=2e-4)


@pytest.mark.parametrize("train", [False, True])
def test_bigru_model_pallas_matches_xla(train):
    """Model level: the 4-layer bigru forward agrees between the fused
    kernel path and the XLA path (dropout off for determinism)."""
    from pytorch_video_action_tpu.models import build_model

    # defaults=True: H=128, dropout 0.5 — dropout masks are drawn from the
    # same PRNGKey in both paths, so train-mode outputs stay comparable
    model = build_model("bigru", 8, defaults=True)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    b, t = 8, 64
    x = jnp.asarray(rng.normal(size=(b, t, 400)).astype(np.float32))
    lengths = jnp.asarray(np.linspace(t // 2, t, b).astype(np.int32))
    orig = R.USE_PALLAS
    try:
        R.USE_PALLAS = True
        out_k = model.apply(params, x, lengths, train=train,
                            rng=jax.random.PRNGKey(2))
        R.USE_PALLAS = False
        out_x = model.apply(params, x, lengths, train=train,
                            rng=jax.random.PRNGKey(2))
    finally:
        R.USE_PALLAS = orig
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), atol=3e-5, rtol=2e-4)


@pytest.mark.parametrize("lstm", [False, True], ids=["gru", "lstm"])
def test_fused_layer_chunk_dw_off_grads_match(monkeypatch, lstm):
    """The CHUNK_DW=0 per-step weight-grad fallback (the flag-gated escape
    hatch for the chunk-batched accumulation) must produce the same grads
    as the default chunk-batched form — both vs each other and vs XLA."""
    mk, run = (_mk_lstm, _run_lstm) if lstm else (_mk, _run)
    layer, x, lengths = mk(seed=29)
    w = jnp.asarray(
        np.random.default_rng(31).normal(size=(8, 64, 256)).astype(np.float32))
    w = w * R.length_mask(lengths, 64).astype(jnp.float32)[:, :, None]

    def loss(layer, x, use_pallas):
        return jnp.sum(run(layer, x, lengths, 128, use_pallas, split=True) * w)

    monkeypatch.setattr(F, "CHUNK_DW", False)
    l_off, g_off = jax.value_and_grad(loss, argnums=(0, 1))(layer, x, True)
    monkeypatch.setattr(F, "CHUNK_DW", True)
    l_on, g_on = jax.value_and_grad(loss, argnums=(0, 1))(layer, x, True)
    l_x, g_x = jax.value_and_grad(loss, argnums=(0, 1))(layer, x, False)
    np.testing.assert_allclose(float(l_off), float(l_x), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(g_off), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=2e-4)
    # off-vs-on: identical math reassociated over the chunk — near-exact
    for a, b_ in zip(jax.tree.leaves(g_off), jax.tree.leaves(g_on)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-4)


def test_split_vmem_estimate_within_limit():
    """ADVICE r4: the CHUNK_DW batched weight-grad temporaries (transposed
    hp2d copy + cast gate-grad blocks + f32 n-block product) were not in the
    chunk picker's VMEM estimate, and the chipless AOT compile path enforces
    the scoped-VMEM limit STRICTLY while runtime JIT admits an over-budget
    stack (the round-4 flash regression).  The picker deliberately keeps its
    historical budget (chunk picks — and measured perf — unchanged); the
    split pallas_calls instead request an explicit ``_SPLIT_VMEM_LIMIT``,
    and this guard pins estimate(include_dw=True) * 1.3 <= that limit for
    every bench-config shape the picker admits, so limit/budget drift can't
    silently reintroduce the AOT OOM."""
    shapes = [
        # (b, h, w_in, g, lstm): bench regimes — bigru/bilstm b=64 layer-0
        # (w_in=400) and stacked (w_in=2H=256); attn's 1-layer BiGRU at the
        # kernel's padded minimum batch (B=4 -> 8)
        (64, 128, 400, 3, False), (64, 128, 256, 3, False),
        (64, 128, 400, 4, True), (64, 128, 256, 4, True),
        (8, 128, 400, 3, False), (8, 128, 256, 3, False),
    ]
    assert F.CHUNK_DW  # default-on; include_dw is a no-op otherwise
    for dtype in (jnp.float32, jnp.bfloat16):
        for t in (64, 1024, 4096):
            for b, h, w_in, g, lstm in shapes:
                chunk = F._pick_chunk_split(t, b, h, w_in, dtype, g, lstm)
                if chunk is None:
                    continue
                est = F._est_split(chunk, b, h, w_in, dtype, g, lstm,
                                   include_dw=True)
                assert est * 1.3 <= F._SPLIT_VMEM_LIMIT, (
                    t, b, h, w_in, g, lstm, dtype, chunk, est)


@pytest.mark.parametrize("lstm", [False, True], ids=["gru", "lstm"])
def test_fused_layer_inkernel_hp_off_grads_match(monkeypatch, lstm):
    """PVA_RNN_INKERNEL_HP=0 (legacy XLA pad-glue previous-state planes)
    must produce grads identical to the default in-kernel-tile form — the
    two read the SAME ys rows, so outputs are bit-equal — and both match
    XLA.  Ragged lengths exercise the boundary rows across chunk edges."""
    mk, run = (_mk_lstm, _run_lstm) if lstm else (_mk, _run)
    layer, x, lengths = mk(seed=37)
    w = jnp.asarray(
        np.random.default_rng(41).normal(size=(8, 64, 256)).astype(np.float32))
    w = w * R.length_mask(lengths, 64).astype(jnp.float32)[:, :, None]

    def loss(layer, x, use_pallas):
        return jnp.sum(run(layer, x, lengths, 128, use_pallas, split=True) * w)

    monkeypatch.setattr(F, "INKERNEL_HP", False)
    l_off, g_off = jax.value_and_grad(loss, argnums=(0, 1))(layer, x, True)
    monkeypatch.setattr(F, "INKERNEL_HP", True)
    l_on, g_on = jax.value_and_grad(loss, argnums=(0, 1))(layer, x, True)
    l_x, g_x = jax.value_and_grad(loss, argnums=(0, 1))(layer, x, False)
    np.testing.assert_allclose(float(l_on), float(l_x), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=2e-4)
    # on-vs-off: identical reads, identical math — exact
    assert float(l_on) == float(l_off)
    for a, b_ in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_off)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


@pytest.mark.parametrize("train", [False, True], ids=["eval", "train"])
def test_fused_boundary_matches_glue(monkeypatch, train):
    """PVA_RNN_FUSED_BOUNDARY (layer-boundary concat*mask -> hash dropout
    fused into the next layer's kernel) must be BIT-identical to the XLA
    glue path in values and grads: the in-kernel fmix32 stream reproduces
    ``hashmask.keep_mask(strides=(2H, T*2H, 1))`` element-for-element and
    the rng split sequence is unchanged.  4-layer stack, ragged lengths,
    dropout active in train mode."""
    rng = jax.random.PRNGKey(11)
    layers = R.init_rnn(rng, 16, 128, 4, bidirectional=True, n_gates=3)
    x = jnp.asarray(
        np.random.default_rng(43).normal(size=(8, 64, 16)).astype(np.float32))
    lengths = jnp.asarray(np.linspace(21, 64, 8).astype(np.int32))
    w = jnp.asarray(
        np.random.default_rng(47).normal(size=(8, 64, 256)).astype(np.float32))

    def loss(layers, x, bnd):
        monkeypatch.setattr(F, "FUSED_BOUNDARY", bnd)
        orig = R.USE_PALLAS
        R.USE_PALLAS = True
        try:
            out = R._run_stack_fused_tm(
                "gru", layers, x, lengths, 128,
                dropout_rate=0.5 if train else 0.0, train=train,
                rng=jax.random.PRNGKey(7) if train else None)
        finally:
            R.USE_PALLAS = orig
        return jnp.sum(out * w)

    l1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(layers, x, True)
    l0, g0 = jax.value_and_grad(loss, argnums=(0, 1))(layers, x, False)
    assert float(l1) == float(l0)
    for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
