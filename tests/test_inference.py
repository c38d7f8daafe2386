"""Inference drivers end-to-end on the synthetic dataset: ensemble voting,
scene aggregation, LM beam search, CSV byte-format."""

import os

import numpy as np
import pytest

from pytorch_video_action_tpu.data import BatchFeed, VideoDataset
from pytorch_video_action_tpu.models import build_model
from pytorch_video_action_tpu.train import Trainer, evaluate, save_params


@pytest.fixture(scope="module")
def trained_models(synthetic_root, tmp_path_factory):
    """Train two default-hyperparameter models and save them under the
    checkpoint naming contract."""
    models_dir = str(tmp_path_factory.mktemp("models"))
    kw = dict(
        data_dir=os.path.join(str(synthetic_root), "data"),
        annot_path=str(synthetic_root),
        split=0,
        mode="active",
        cache_dir=os.path.join(str(synthetic_root), "cache-inf"),
        verbose=False,
    )
    train_ds = VideoDataset(part="train", **kw)
    n_class = train_ds.n_class
    names = []
    for mname, epochs, lr in [("simple_fc", 4, 1e-3), ("vanilla_lstm", 3, 5e-3)]:
        model = build_model(mname, n_class, defaults=True)
        trainer = Trainer(model, n_class, lr=lr, seed=0)
        ts = trainer.init_state()
        feed = BatchFeed(train_ds, batch_size=2, bucket_multiple=32, shuffle=True, seed=0)
        for _ in range(epochs):
            for b in feed:
                trainer.train_step(ts, b)
        acc, _ = evaluate(model, ts.params, BatchFeed(train_ds, batch_size=2, bucket_multiple=32))
        name = f"{mname}_{acc:.2f}_dev"
        save_params(os.path.join(models_dir, f"{name}.npz"), ts.params)
        names.append(name)
    return {"models_dir": models_dir, "names": names, "n_class": n_class}


def _common_argv(synthetic_root, trained_models, results_dir):
    return [
        "--data_dir", os.path.join(str(synthetic_root), "data"),
        "--annot_path", str(synthetic_root),
        "--models_dir", trained_models["models_dir"],
        "--results_dir", results_dir,
        "--bucket_multiple", "32",
    ]


def test_parse_model_type():
    from pytorch_video_action_tpu.infer.loader import parse_model_type

    assert parse_model_type("bigru_73.52_dev") == "bigru"
    assert parse_model_type("vanilla_lstm_70.11_dev") == "vanilla_lstm"
    assert parse_model_type("mstcn_75.59_dev") == "mstcn"


def test_voting_primitives():
    from pytorch_video_action_tpu.infer.voting import (
        candidate_labels,
        select_across_models,
        zero_avoided_vote,
    )

    assert zero_avoided_vote(np.array([2, 2, 3])) == 2
    # zero-avoidance: 0 wins raw vote -> intended second-most-frequent
    assert zero_avoided_vote(np.array([0, 0, 0, 5, 5, 3])) == 5
    # counts [5,3,2,4]: intended -> label 3 (second-most), literal reference
    # quirk (argsort ascending [1]) -> label 1 (second-least)
    seg = np.array([0] * 5 + [1] * 3 + [2] * 2 + [3] * 4)
    assert zero_avoided_vote(seg) == 3
    assert zero_avoided_vote(seg, True) == 1
    # cross-model: clean mode
    assert select_across_models([4, 4, 7], [0.1, 0.2, 0.9], [3, 3, 3], "big") == 4
    # tie, equal frames -> probability preference
    assert select_across_models([4, 7], [0.1, 0.9], [3, 3], "big") == 7
    assert select_across_models([4, 7], [0.1, 0.9], [3, 3], "small") == 4
    # tie, unequal frames -> most frames
    assert select_across_models([4, 7], [0.9, 0.1], [2, 5], "big") == 7
    assert select_across_models([], [], [], "big") == 0
    # candidates: sorted by count desc, thresholded; uniform-zero segment -> none
    cands = candidate_labels(np.array([5, 5, 5, 3, 3, 1]), 0.2)
    assert cands.tolist() == [5, 3, 1]  # normalized counts 1.0/0.67/0.33
    cands = candidate_labels(np.array([5, 5, 5, 3, 3, 1]), 0.5)
    assert cands.tolist() == [5, 3]
    assert candidate_labels(np.array([0, 0, 0]), 0.2).size == 0


def test_ensemble_dev(synthetic_root, trained_models, tmp_path):
    from pytorch_video_action_tpu.cli.inference_cli import main

    argv = (
        ["--pretrained_model", *trained_models["names"], "--prob", "big",
         "--part", "dev", "--split", "0"]
        + _common_argv(synthetic_root, trained_models, str(tmp_path))
    )
    acc = main(argv)
    assert 0.0 <= acc <= 100.0
    assert acc > 30.0  # separable synthetic data, trained models


def test_bf16_inference_matches_f32(synthetic_root, trained_models, tmp_path):
    """--dtype bfloat16 (TPU inference performance extension, +55% measured
    ms_tcn eval — docs/PERF_NOTES.md): the CLI runs end-to-end and the
    frame predictions agree with the f32 path on (nearly) every frame —
    only near-tied argmax rows may flip."""
    import numpy as np

    from pytorch_video_action_tpu.cli.inference_cli import main
    from pytorch_video_action_tpu.data.dataset import VideoDataset
    from pytorch_video_action_tpu.infer.loader import load_models
    from pytorch_video_action_tpu.infer.predict import frame_predictions

    base = ["--pretrained_model", *trained_models["names"], "--prob", "big",
            "--part", "dev", "--split", "0"] + _common_argv(
                synthetic_root, trained_models, str(tmp_path))
    acc32 = main(base + ["--dtype", "float32"])
    acc16 = main(base + ["--dtype", "bfloat16"])
    assert abs(acc32 - acc16) < 10.0  # same separable data, both trained

    ds = VideoDataset(
        data_dir=os.path.join(str(synthetic_root), "data"),
        annot_path=str(synthetic_root), part="dev", load_all=True,
        split=0, mode="active",
    )
    models = load_models(
        trained_models["names"], ds.n_class,
        models_dir=trained_models["models_dir"],
    )
    mdef, params = next(iter(models.values()))
    p32 = frame_predictions(mdef, params, ds.features, bucket_multiple=32)
    p16 = frame_predictions(mdef, params, ds.features, bucket_multiple=32,
                            dtype="bfloat16")
    agree = total = 0
    for (a, _), (b, _) in zip(p32, p16):
        agree += int((a == b).sum())
        total += len(a)
    assert agree / total > 0.98, agree / total


def test_ensemble_test_csv(synthetic_root, trained_models, tmp_path):
    from pytorch_video_action_tpu.cli.inference_cli import main
    from pytorch_video_action_tpu.data.bundles import load_segment_file

    argv = (
        ["--pretrained_model", *trained_models["names"], "--prob", "big",
         "--part", "test"]
        + _common_argv(synthetic_root, trained_models, str(tmp_path))
    )
    result_path = main(argv)
    assert os.path.exists(result_path)
    with open(result_path) as f:
        content = f.read()
    lines = content.split("\n")
    assert lines[0] == "Id,Category"
    assert not content.endswith("\n")  # reference byte-format quirk
    seg_lines = load_segment_file(os.path.join(str(synthetic_root), "segment.txt"))
    expected = sum(len(s) - 1 for s in seg_lines)
    assert len(lines) - 1 == expected
    for i, line in enumerate(lines[1:]):
        idx, label = line.split(",")
        assert int(idx) == i
        assert 0 <= int(label) < trained_models["n_class"]


def test_scene_aggregation(synthetic_root, trained_models, tmp_path):
    from pytorch_video_action_tpu.cli.inference_scene_cli import main

    argv = (
        ["--pretrained_model", *trained_models["names"], "--prob", "big"]
        + _common_argv(synthetic_root, trained_models, str(tmp_path))
    )
    result_path = main(argv)
    assert os.path.exists(result_path)
    with open(result_path) as f:
        lines = f.read().split("\n")
    assert lines[0] == "Id,Category"
    assert len(lines) > 1


def test_beam_inference(synthetic_root, trained_models, tmp_path):
    from pytorch_video_action_tpu.cli.inference_lm_cli import main as lm_main
    from pytorch_video_action_tpu.cli.lm_generation_cli import main as gen_main

    arpa = str(tmp_path / "lm.arpa")
    corpus = str(tmp_path / "corpus.txt")
    gen_main(["--annot_path", str(synthetic_root), "--out", corpus,
              "--arpa_out", arpa, "--order", "3"])
    assert os.path.exists(arpa)

    argv = (
        ["--pretrained_model", *trained_models["names"], "--part", "dev",
         "--split", "0", "--lm_path", arpa]
        + _common_argv(synthetic_root, trained_models, str(tmp_path))
    )
    acc = lm_main(argv)
    assert 0.0 <= acc <= 100.0

    # device (batched TPU) beam search must reproduce the host result exactly
    acc_dev = lm_main(argv + ["--device_beam"])
    assert acc_dev == acc

    argv_test = (
        ["--pretrained_model", *trained_models["names"], "--part", "test",
         "--lm_path", arpa]
        + _common_argv(synthetic_root, trained_models, str(tmp_path))
    )
    result_path = lm_main(argv_test)
    assert os.path.exists(result_path)


def test_scene_key():
    from pytorch_video_action_tpu.infer.scene import scene_key

    assert scene_key("P16_cam01_P16_cereals.txt") == "P16_cereals.txt"


def test_ensemble_parity_quirks_dropout_at_test(synthetic_root, trained_models,
                                                tmp_path):
    """--parity_quirks reproduces the reference inference.py quirk of never
    calling net.eval(): dropout stays active, results remain valid."""
    from pytorch_video_action_tpu.cli.inference_cli import main

    argv = (
        ["--pretrained_model", *trained_models["names"], "--prob", "big",
         "--part", "dev", "--split", "0", "--parity_quirks"]
        + _common_argv(synthetic_root, trained_models, str(tmp_path))
    )
    acc = main(argv)
    assert 0.0 <= acc <= 100.0
