#!/usr/bin/env python
"""Breakfast-scale synthetic smoke set: exercises the full pipeline at the
real dataset's shape (hundreds of videos, 500-2500 frames, 48 classes,
400-dim features) without the real (user-supplied) data.

Features are written straight into the reference's pickle-cache format
(``data-comp/{part}-{split}-features.npy``, ``data_utils.py:162-163``) so the
slow gz text round-trip is skipped; bundles, mapping, ground-truth label
files and ``segment.txt`` are the real on-disk contracts.

Usage:
    python tools/scale_smoke.py --root /tmp/pva_scale [--n_train 120 ...]
    cd /tmp/pva_scale && python $REPO/train.py --model bigru --epoch 2 \
        --batchsize 8 --bucket_multiple 256 --annot_path . --data_dir ./data
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

N_FEAT = 400


def class_names(n_class: int) -> list[str]:
    return ["SIL"] + [f"action_{i:02d}" for i in range(1, n_class)]


def make_video(rng, means, t_min, t_max, n_class):
    t_target = int(rng.integers(t_min, t_max))
    labels = []
    labels += [0] * int(rng.integers(20, 120))  # leading SIL
    while True:  # always >=1 action segment (segment.txt needs a non-SIL extent)
        cls = int(rng.integers(1, n_class))
        labels += [cls] * int(rng.integers(40, 300))
        if len(labels) >= t_target:
            break
    labels += [0] * int(rng.integers(20, 120))  # trailing SIL
    labels = np.array(labels[: t_max + 200], dtype=np.int64)
    feats = (means[labels] + rng.normal(0, 0.45, size=(len(labels), N_FEAT))
             ).astype(np.float32)
    return feats, labels


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n_train", type=int, default=120)
    ap.add_argument("--n_dev", type=int, default=30)
    ap.add_argument("--n_test", type=int, default=30)
    ap.add_argument("--t_min", type=int, default=500)
    ap.add_argument("--t_max", type=int, default=2500)
    ap.add_argument("--n_class", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--write_gz", action="store_true",
                    help="Also write real gzipped text feature files "
                         "(slower; enables training on data_splitting CV "
                         "folds, which bypass the injected pickle caches)")
    args = ap.parse_args(argv)

    root = args.root
    rng = np.random.default_rng(args.seed)
    names = class_names(args.n_class)
    means = rng.normal(0.0, 1.0, size=(args.n_class, N_FEAT)).astype(np.float32)

    for d in ("splits/splits", "splits/new_splits", "groundTruth/groundTruth",
              "data", "data-comp"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    with open(os.path.join(root, "splits/splits/mapping_bf.txt"), "w") as f:
        for i, n in enumerate(names):
            f.write(f"{i} {n}\n")

    cams = ["cam01", "cam02", "webcam01"]
    acts = ["cereals", "milk", "tea", "coffee", "juice"]

    def gen(prefix, count):
        out = []
        for i in range(count):
            name = (f"{prefix}{i:03d}_{cams[i % 3]}_{prefix}{i:03d}_"
                    f"{acts[i % 5]}")
            feats, labels = make_video(rng, means, args.t_min, args.t_max,
                                       args.n_class)
            with open(os.path.join(root, "groundTruth/groundTruth",
                                   f"{name}.txt"), "w") as f:
                f.write("\n".join(names[l] for l in labels) + "\n")
            if args.write_gz:
                import gzip

                with gzip.open(os.path.join(root, "data", f"{name}.gz"),
                               "wt") as f:
                    np.savetxt(f, feats, fmt="%.6f")
            out.append((name, feats, labels))
        return out

    def bundle(path, videos):
        with open(os.path.join(root, path), "w") as f:
            f.write("#bundle\n")
            for n, _, _ in videos:
                f.write(f"./data/groundTruth/{n}.txt\n")

    def cache(part, split, videos):
        feats = np.empty(len(videos), dtype=object)
        labels = np.empty(len(videos), dtype=object)
        for i, (_, ft, lb) in enumerate(videos):
            feats[i], labels[i] = ft, lb
        np.save(os.path.join(root, "data-comp", f"{part}-{split}-features.npy"),
                feats, allow_pickle=True)
        np.save(os.path.join(root, "data-comp", f"{part}-{split}-labels.npy"),
                labels, allow_pickle=True)

    train = gen("P", args.n_train)
    dev = gen("D", args.n_dev)
    test = gen("T", args.n_test)
    bundle("splits/new_splits/train.split0.bundle", train)
    bundle("splits/new_splits/dev.split0.bundle", dev)
    bundle("splits/splits/test.split1.bundle", test)
    # the full Kaggle training bundle = the videos the CV folds partition
    # (consumed by data_splitting.py and lm_generation.py)
    bundle("splits/splits/train.split1.bundle", train + dev)
    cache("train", 0, train)
    cache("dev", 0, dev)
    cache("test", 1, test)

    with open(os.path.join(root, "segment.txt"), "w") as f:
        for _, _, labels in test:
            bounds = [0] + (np.nonzero(np.diff(labels))[0] + 1).tolist() + [
                len(labels)
            ]
            # reference segment.txt covers the non-SIL extent
            active = np.nonzero(labels != 0)[0]
            bounds = [b for b in bounds
                      if active[0] <= b <= active[-1] + 1]
            f.write(" ".join(str(b) for b in bounds) + "\n")

    frames = sum(len(l) for _, _, l in train)
    print(f"wrote {args.n_train}+{args.n_dev}+{args.n_test} videos under "
          f"{root}; {frames} train frames, "
          f"T in [{min(len(l) for _, _, l in train)}, "
          f"{max(len(l) for _, _, l in train)}]")


if __name__ == "__main__":
    main(sys.argv[1:])
