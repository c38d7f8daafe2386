"""Time-major fused RNN stack (``ops/rnn.py`` ``_run_stack_fused_tm``).

The per-layer fused path transposes to time-major before EVERY layer kernel
and back after it, so each inter-layer boundary pays two [B,T,2H]
transpose materializations around the concat/mask/dropout glue (round-4
profile: the Pallas kernels are at roofline; the residual step time is
XLA glue).  The stack path keeps the stream time-major across the whole
stack — one transpose in, one out — and draws the inter-layer dropout
masks with BATCH-MAJOR index strides (``hashmask.keep_mask`` ``strides``)
so the stream is bit-identical to the per-layer path's (masks depend on
the element's ``(b*T+t)*2H+c`` linear index, which is invariant to batch
padding and to the tensor's in-memory layout).

Reference semantics unchanged: ``torch.nn.GRU/LSTM(bidirectional=True)``
inter-layer dropout placement (``networks.py:143-167``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_video_action_tpu.ops import rnn as R

CELLS = pytest.mark.parametrize("cell", ["gru", "lstm"])


def _mk_stack(b, t, d=16, h=128, n_layers=3, seed=0, cell="gru"):
    rng = jax.random.PRNGKey(seed)
    layers = R.init_rnn(
        rng, d, h, n_layers, bidirectional=True,
        n_gates=3 if cell == "gru" else 4)
    x = jnp.asarray(
        np.random.default_rng(seed).normal(size=(b, t, d)).astype(np.float32))
    lengths = jnp.asarray(np.linspace(t // 3, t, b).astype(np.int32))
    return layers, x, lengths


def _apply(cell, layers, x, lengths, h, *, stack_tm, train=False, rng=None,
           dropout=0.5):
    orig_p, orig_tm = R.USE_PALLAS, R.STACK_TM
    R.USE_PALLAS, R.STACK_TM = True, stack_tm
    try:
        return R.rnn_apply(
            cell, layers, x, lengths, h, bidirectional=True,
            dropout_rate=dropout, train=train, rng=rng)
    finally:
        R.USE_PALLAS, R.STACK_TM = orig_p, orig_tm


@CELLS
@pytest.mark.parametrize("train", [False, True])
def test_stack_matches_per_layer_values(cell, train):
    """Stack path == per-layer path, eval and train (identical dropout
    stream via batch-major-strided masks)."""
    layers, x, lengths = _mk_stack(8, 32, cell=cell)
    rng = jax.random.PRNGKey(7) if train else None
    out_s = _apply(cell, layers, x, lengths, 128, stack_tm=True,
                   train=train, rng=rng)
    out_p = _apply(cell, layers, x, lengths, 128, stack_tm=False,
                   train=train, rng=rng)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_p), atol=1e-6, rtol=1e-6)


@CELLS
def test_stack_matches_per_layer_grads(cell):
    layers, x, lengths = _mk_stack(8, 32, seed=3, cell=cell)
    w = jnp.asarray(
        np.random.default_rng(9).normal(size=(8, 32, 256)).astype(np.float32))
    rng = jax.random.PRNGKey(11)

    def loss(layers, x, stack_tm):
        out = _apply(cell, layers, x, lengths, 128, stack_tm=stack_tm,
                     train=True, rng=rng)
        return jnp.sum(out * w)

    ls, gs = jax.value_and_grad(loss, argnums=(0, 1))(layers, x, True)
    lp, gp = jax.value_and_grad(loss, argnums=(0, 1))(layers, x, False)
    np.testing.assert_allclose(float(ls), float(lp), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(gs), jax.tree.leaves(gp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5)


def test_stack_small_batch_padding():
    """B=4 (attn regime) rides the stack path through the 8-row pad; padded
    rows must not leak into real rows' values."""
    layers, x, lengths = _mk_stack(4, 32, cell="gru")
    out_s = _apply("gru", layers, x, lengths, 128, stack_tm=True,
                   train=True, rng=jax.random.PRNGKey(5))
    out_p = _apply("gru", layers, x, lengths, 128, stack_tm=False,
                   train=True, rng=jax.random.PRNGKey(5))
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_p), atol=1e-6, rtol=1e-6)


def test_stack_matches_xla_path_train():
    """The decisive stream test: stack path (time-major, strided masks) ==
    pure-XLA per-layer path (batch-major, row-major masks) in TRAIN mode —
    the dropout masks must be bit-identical across layouts."""
    layers, x, lengths = _mk_stack(8, 32, seed=13, cell="gru")
    rng = jax.random.PRNGKey(17)
    out_s = _apply("gru", layers, x, lengths, 128, stack_tm=True,
                   train=True, rng=rng)
    orig_p, orig_tm = R.USE_PALLAS, R.STACK_TM
    R.USE_PALLAS, R.STACK_TM = False, False
    try:
        out_x = R.rnn_apply(
            "gru", layers, x, lengths, 128, bidirectional=True,
            dropout_rate=0.5, train=True, rng=rng)
    finally:
        R.USE_PALLAS, R.STACK_TM = orig_p, orig_tm
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_x), atol=3e-5, rtol=2e-4)


def test_stack_threefry_arm_matches_per_layer():
    """PVA_MODEL_HASH_DROPOUT=0 fallback: the threefry masks must also be
    stream-identical across paths (drawn over the UNPADDED batch-major
    shape), including through the 8-row pad."""
    from pytorch_video_action_tpu.ops import hashmask as H

    layers, x, lengths = _mk_stack(4, 32, seed=21, cell="gru")
    orig = H.MODEL_DROPOUT
    H.MODEL_DROPOUT = False
    try:
        out_s = _apply("gru", layers, x, lengths, 128, stack_tm=True,
                       train=True, rng=jax.random.PRNGKey(23))
        out_p = _apply("gru", layers, x, lengths, 128, stack_tm=False,
                       train=True, rng=jax.random.PRNGKey(23))
    finally:
        H.MODEL_DROPOUT = orig
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_p), atol=1e-6, rtol=1e-6)


def test_keep_mask_strided_matches_row_major():
    """``keep_mask(..., strides=)`` with row-major strides of a transposed
    view reproduces the canonical stream element-for-element."""
    from pytorch_video_action_tpu.ops import hashmask as H

    b, t, c = 3, 5, 8
    m_bm = H.keep_mask(123, (b, t, c), H.threshold(0.5))
    # time-major view of the same logical tensor: axis strides follow the
    # BATCH-major linear index (b*t*c order)
    m_tm = H.keep_mask(123, (t, b, c), H.threshold(0.5),
                       strides=(c, t * c, 1))
    np.testing.assert_array_equal(
        np.asarray(m_bm), np.asarray(jnp.swapaxes(m_tm, 0, 1)))
