"""ops/hashmask.py: the counter-hash dropout-mask stream shared by the
conv kernels (in-kernel + XLA recompute), flash attention, and ring/Ulysses.
The product paths are covered by their own numerics tests; these pin the
statistical and reproducibility contract of the stream itself."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_video_action_tpu.ops.hashmask import (
    fmix32,
    keep_mask,
    keep_mask8,
    packed_exact,
    rng_seed_u32,
    threshold,
)


def test_keep_fraction_matches_rate():
    for keep in (0.25, 0.5, 0.7, 0.9):
        m = np.asarray(keep_mask(jnp.uint32(7), (512, 128), threshold(keep)))
        assert abs(m.mean() - keep) < 0.01, keep


def test_seed_and_offset_decorrelate():
    thr = threshold(0.5)
    a = np.asarray(keep_mask(jnp.uint32(1), (256, 128), thr))
    b = np.asarray(keep_mask(jnp.uint32(2), (256, 128), thr))
    c = np.asarray(keep_mask(jnp.uint32(1), (256, 128), thr,
                             offset=jnp.int32(3)))
    # distinct seeds / offsets give ~independent masks (~50% agreement)
    assert 0.45 < (a == b).mean() < 0.55
    assert 0.45 < (a == c).mean() < 0.55
    # same seed+offset is bit-identical (the backward-recompute contract)
    a2 = np.asarray(keep_mask(jnp.uint32(1), (256, 128), thr))
    assert (a == a2).all()


def test_engineered_shift_pairs_decorrelate():
    """Round-2 advisor finding: with the old additive fold (idx + seed*GOLDEN)
    every stream was a shifted copy of one global sequence, so seed pairs with
    delta*GOLDEN mod 2^32 == k were bit-identical k elements apart.  Construct
    exactly those adversarial pairs and assert the streams no longer align at
    ANY small shift."""
    thr = threshold(0.5)
    inv_g = pow(0x9E3779B9, -1, 2 ** 32)
    inv_c = pow(0x85EBCA77, -1, 2 ** 32)
    for k in (1, 7, 128):
        d = (inv_g * k) % 2 ** 32
        a = np.asarray(keep_mask(jnp.uint32(5), (64, 1024), thr)).ravel()
        b = np.asarray(
            keep_mask(jnp.uint32((5 + d) % 2 ** 32), (64, 1024), thr)).ravel()
        assert 0.45 < (a == b).mean() < 0.55, k
        assert 0.45 < (a[k:] == b[:-k]).mean() < 0.55, k  # old scheme: 1.0
    for k in (1, 16):
        d = (inv_c * k) % 2 ** 32
        a = np.asarray(keep_mask(jnp.uint32(5), (64, 1024), thr,
                                 offset=0)).ravel()
        b = np.asarray(keep_mask(jnp.uint32(5), (64, 1024), thr,
                                 offset=d)).ravel()
        assert 0.45 < (a[k:] == b[:-k]).mean() < 0.55, k


def test_offset_accepts_python_int_and_traced():
    """offset may be a plain Python int (docstring usage) or a traced scalar;
    both select the same stream."""
    thr = threshold(0.5)
    a = np.asarray(keep_mask(jnp.uint32(1), (64, 64), thr, offset=3))
    b = np.asarray(keep_mask(jnp.uint32(1), (64, 64), thr,
                             offset=jnp.int32(3)))
    c = np.asarray(jax.jit(
        lambda o: keep_mask(jnp.uint32(1), (64, 64), thr, offset=o)
    )(jnp.int32(3)))
    assert (a == b).all() and (a == c).all()


def test_no_row_or_column_structure():
    """The mask must not correlate along rows/columns (a linear-index bug
    would show up as striping)."""
    m = np.asarray(
        keep_mask(jnp.uint32(3), (256, 256), threshold(0.5))).astype(float)
    assert np.abs(m.mean(axis=0) - 0.5).max() < 0.12
    assert np.abs(m.mean(axis=1) - 0.5).max() < 0.12


def test_rank_consistency():
    """A rank-4 mask equals the rank-2 mask over the same linear indices
    (shared stream across the conv kernel's [T,C] and flash's [B,H,T,c])."""
    thr = threshold(0.5)
    m4 = np.asarray(keep_mask(jnp.uint32(9), (2, 3, 8, 128), thr))
    m2 = np.asarray(keep_mask(jnp.uint32(9), (6, 8 * 128), thr))
    assert (m4.reshape(6, 8 * 128) == m2).all()


def test_rng_seed_u32_accepts_key_forms():
    k = jax.random.PRNGKey(42)
    s1 = int(rng_seed_u32(k))
    s2 = int(rng_seed_u32(jax.random.PRNGKey(42)))
    s3 = int(rng_seed_u32(jax.random.PRNGKey(43)))
    assert s1 == s2 != s3
    # works under jit (traced key)
    s4 = int(jax.jit(rng_seed_u32)(k))
    assert s4 == s1


def test_packed_keep_fraction_and_determinism():
    """keep_mask8 (4 Bernoulli bytes per hash word — the ms_tcn training
    mask stream since round 3) draws at the exact byte rate and is
    bit-reproducible in (seed, offset), the recompute-backward contract."""
    for keep in (0.25, 0.5, 0.75):
        assert packed_exact(keep)
        m = np.asarray(keep_mask8(jnp.uint32(7), (512, 128), keep))
        assert abs(m.mean() - keep) < 0.01, keep
    assert not packed_exact(0.7)  # attn's keep stays on the word stream
    a = np.asarray(keep_mask8(jnp.uint32(1), (256, 128), 0.5))
    assert (a == np.asarray(keep_mask8(jnp.uint32(1), (256, 128), 0.5))).all()
    b = np.asarray(keep_mask8(jnp.uint32(2), (256, 128), 0.5))
    c = np.asarray(keep_mask8(jnp.uint32(1), (256, 128), 0.5,
                              offset=jnp.int32(3)))
    assert 0.45 < (a == b).mean() < 0.55
    assert 0.45 < (a == c).mean() < 0.55


def test_packed_byte_lanes_decorrelate():
    """The 4 keep-bits sharing one fmix32 word must be pairwise independent
    (murmur3 finalizer bytes), and the stream must be layout-stable: any
    shape with the same row-major order gives the same bits."""
    m = np.asarray(keep_mask8(jnp.uint32(11), (4096, 4), 0.5))
    flat = m.reshape(-1, 4)
    for i in range(4):
        for j in range(i + 1, 4):
            agree = (flat[:, i] == flat[:, j]).mean()
            assert 0.45 < agree < 0.55, (i, j, agree)
    # no striping along either axis of a big 2-D mask
    m2 = np.asarray(keep_mask8(jnp.uint32(3), (256, 256), 0.5)).astype(float)
    assert np.abs(m2.mean(axis=0) - 0.5).max() < 0.12
    assert np.abs(m2.mean(axis=1) - 0.5).max() < 0.12
    a = np.asarray(keep_mask8(jnp.uint32(9), (2, 3, 8, 128), 0.5))
    b = np.asarray(keep_mask8(jnp.uint32(9), (6, 8 * 128), 0.5))
    assert (a.reshape(6, 8 * 128) == b).all()


def test_fmix32_avalanche():
    """Flipping one input bit flips ~half the output bits."""
    x = jnp.arange(1024, dtype=jnp.uint32)
    h0 = np.asarray(fmix32(x)).astype(np.uint64)
    h1 = np.asarray(fmix32(x ^ jnp.uint32(1 << 13))).astype(np.uint64)
    flips = np.unpackbits(
        (h0 ^ h1).astype(">u4").view(np.uint8)).astype(float)
    assert 0.4 < flips.mean() < 0.6


def test_model_hash_dropout_semantics():
    """models/common.dropout and the RNN inter-layer site on the hash
    stream: correct keep fraction, 1/keep scaling on kept elements, exact
    zeros on dropped ones, identity at train=False, and the
    PVA_MODEL_HASH_DROPOUT=0 arm reproduces threefry semantics."""
    import pytorch_video_action_tpu.ops.hashmask as hm
    from pytorch_video_action_tpu.models.common import dropout

    x = jnp.ones((64, 257), jnp.float32)
    rng = jax.random.PRNGKey(5)
    assert dropout(rng, x, 0.5, False) is x
    assert dropout(None, x, 0.5, True) is x

    old = hm.MODEL_DROPOUT
    try:
        hm.MODEL_DROPOUT = True
        y = np.asarray(dropout(rng, x, 0.5, True))
        vals = np.unique(y)
        assert set(np.round(vals, 5)) <= {0.0, 2.0}
        assert abs((y != 0).mean() - 0.5) < 0.03
        # independent keys give decorrelated masks
        y2 = np.asarray(dropout(jax.random.PRNGKey(6), x, 0.5, True))
        agree = ((y != 0) == (y2 != 0)).mean()
        assert 0.45 < agree < 0.55
        hm.MODEL_DROPOUT = False
        yt = np.asarray(dropout(rng, x, 0.5, True))
        assert set(np.round(np.unique(yt), 5)) <= {0.0, 2.0}
        assert abs((yt != 0).mean() - 0.5) < 0.03
    finally:
        hm.MODEL_DROPOUT = old


def test_rnn_inter_layer_dropout_streams_differ_per_layer():
    """The inter-layer dropout inside rnn_apply must draw an independent
    mask per layer (rng split per layer, hash stream seeded from the split
    key) — identical masks across layers would correlate the regularizer."""
    import pytorch_video_action_tpu.ops.hashmask as hm
    from pytorch_video_action_tpu.ops.rnn import gru_apply, init_rnn

    rng = jax.random.PRNGKey(0)
    layers = init_rnn(rng, 8, 8, 3, bidirectional=True, n_gates=3)
    x = jnp.ones((2, 32, 8), jnp.float32)
    lengths = jnp.full((2,), 32, jnp.int32)
    old = hm.MODEL_DROPOUT
    try:
        hm.MODEL_DROPOUT = True
        out1 = gru_apply(layers, x, lengths, 8, bidirectional=True,
                         dropout_rate=0.5, train=True,
                         rng=jax.random.PRNGKey(3))
        out2 = gru_apply(layers, x, lengths, 8, bidirectional=True,
                         dropout_rate=0.5, train=True,
                         rng=jax.random.PRNGKey(4))
        assert not np.allclose(np.asarray(out1), np.asarray(out2))
        # eval-mode forward unaffected by the stream choice
        hm.MODEL_DROPOUT = False
        e1 = gru_apply(layers, x, lengths, 8, bidirectional=True,
                       dropout_rate=0.5, train=False)
        hm.MODEL_DROPOUT = True
        e2 = gru_apply(layers, x, lengths, 8, bidirectional=True,
                       dropout_rate=0.5, train=False)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    finally:
        hm.MODEL_DROPOUT = old
