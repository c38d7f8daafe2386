"""Synthetic Breakfast-shaped dataset generator for tests.

Writes the same on-disk layout the reference consumes (SURVEY.md §1 L0):
``splits/splits/mapping_bf.txt``, train/dev bundles under
``splits/new_splits/``, a Kaggle test bundle + ``segment.txt``, per-frame
ground-truth label files and gzipped text feature files.  Features are drawn
from per-class means + noise so models can actually learn the mapping.
"""

from __future__ import annotations

import gzip
import os

import numpy as np

N_FEAT = 400
CLASS_NAMES = ["SIL", "pour_cereals", "pour_milk", "stir_cereals", "take_bowl"]
ACTIVITIES = ["cereals", "milk"]
CAMERAS = ["cam01", "webcam01"]


def _class_means(n_class: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed + 777)
    return rng.normal(0.0, 1.0, size=(n_class, N_FEAT)).astype(np.float32)


def _make_video(rng, means, min_segs=2, max_segs=4, min_len=4, max_len=12):
    """Random segment structure: labels alternate between SIL (0) and actions."""
    labels = []
    n_segs = int(rng.integers(min_segs, max_segs + 1))
    labels += [0] * int(rng.integers(min_len, max_len))  # leading SIL
    for _ in range(n_segs):
        cls = int(rng.integers(1, len(CLASS_NAMES)))
        labels += [cls] * int(rng.integers(min_len, max_len))
    labels += [0] * int(rng.integers(min_len, max_len))  # trailing SIL
    labels = np.array(labels, dtype=np.int64)
    feats = means[labels] + rng.normal(0, 0.3, size=(len(labels), N_FEAT)).astype(
        np.float32
    )
    return feats.astype(np.float32), labels


def _write_feature_gz(path: str, feats: np.ndarray) -> None:
    with gzip.open(path, "wt") as f:
        for row in feats:
            f.write(" ".join(f"{v:.4f}" for v in row) + "\n")


def make_synthetic_tree(
    root,
    n_train: int = 8,
    n_dev: int = 4,
    n_test: int = 4,
    seed: int = 0,
) -> dict:
    root = str(root)
    rng = np.random.default_rng(seed)
    means = _class_means(len(CLASS_NAMES), seed)

    os.makedirs(os.path.join(root, "splits", "splits"), exist_ok=True)
    os.makedirs(os.path.join(root, "splits", "new_splits"), exist_ok=True)
    os.makedirs(os.path.join(root, "groundTruth", "groundTruth"), exist_ok=True)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)

    with open(os.path.join(root, "splits", "splits", "mapping_bf.txt"), "w") as f:
        for i, name in enumerate(CLASS_NAMES):
            f.write(f"{i} {name}\n")

    def gen_videos(prefix: str, count: int, with_labels: bool = True):
        filenames = []
        for i in range(count):
            cam = CAMERAS[i % len(CAMERAS)]
            act = ACTIVITIES[i % len(ACTIVITIES)]
            name = f"{prefix}{i:02d}_{cam}_{prefix}{i:02d}_{act}"
            feats, labels = _make_video(rng, means)
            _write_feature_gz(os.path.join(root, "data", f"{name}.gz"), feats)
            if with_labels:
                with open(
                    os.path.join(root, "groundTruth", "groundTruth", f"{name}.txt"),
                    "w",
                ) as f:
                    for l in labels:
                        f.write(CLASS_NAMES[l] + "\n")
            filenames.append((name, feats, labels))
        return filenames

    train_videos = gen_videos("P", n_train)
    dev_videos = gen_videos("D", n_dev)
    test_videos = gen_videos("T", n_test, with_labels=True)

    def write_bundle(path: str, names: list[str]) -> None:
        with open(path, "w") as f:
            f.write("#bundle\n")
            for n in names:
                f.write(f"./data/groundTruth/{n}.txt\n")

    for split in range(2):
        write_bundle(
            os.path.join(root, "splits", "new_splits", f"train.split{split}.bundle"),
            [n for n, _, _ in train_videos],
        )
        write_bundle(
            os.path.join(root, "splits", "new_splits", f"dev.split{split}.bundle"),
            [n for n, _, _ in dev_videos],
        )
    write_bundle(
        os.path.join(root, "splits", "splits", "test.split1.bundle"),
        [n for n, _, _ in test_videos],
    )
    # Kaggle-style train bundle (used by data_splitting / lm_generation tools)
    write_bundle(
        os.path.join(root, "splits", "splits", "train.split1.bundle"),
        [n for n, _, _ in train_videos],
    )

    # segment.txt: true run-length boundaries of the non-SIL extent per test video
    seg_lines = []
    for _, feats, labels in test_videos:
        active = np.nonzero(labels != 0)[0]
        start, end = int(active[0]), int(active[-1]) + 1
        bounds = [start]
        for t in range(start + 1, end):
            if labels[t] != labels[t - 1]:
                bounds.append(t)
        bounds.append(end)
        seg_lines.append(" ".join(str(b) for b in bounds))
    with open(os.path.join(root, "segment.txt"), "w") as f:
        f.write("\n".join(seg_lines) + "\n")

    return {
        "root": root,
        "train": train_videos,
        "dev": dev_videos,
        "test": test_videos,
        "class_names": CLASS_NAMES,
        "means": means,
    }
