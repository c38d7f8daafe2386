"""``data_splitting.py`` CLI — stratified 5-fold train/dev split generation.

Reference ``data_splitting.py:40-113``: reads the Kaggle
``train.split1.bundle``, stratifies on the activity label (last ``_`` part of
the filename), and writes ``splits/new_splits/{train,dev}.split{k}.bundle``
with a ``# Counter(...)`` header plus per-fold class/camera statistics.
"""

from __future__ import annotations

import argparse
import collections
import os

import numpy as np

from ..data.bundles import read_lines


def stratified_kfold_indices(y: np.ndarray, n_splits: int, seed: int = 123):
    """Stratified K-fold; uses scikit-learn when available (reference parity,
    ``data_splitting.py:68``), else an order-preserving fallback with the
    same class-balance guarantee.

    The reference passes ``random_state=123`` without ``shuffle`` — on its
    sklearn that was silently ignored (shuffle=False is deterministic);
    modern sklearn raises for that combination, so true parity is
    ``StratifiedKFold(n_splits)`` with no random_state."""
    del seed  # kept in the signature for the reference's CLI surface
    try:
        from sklearn.model_selection import StratifiedKFold
    except ImportError:
        pass
    else:
        # sklearn's own validation errors (e.g. n_splits > smallest class
        # count) must propagate — the reference would crash the same way
        skf = StratifiedKFold(n_splits=n_splits)
        return list(skf.split(np.zeros_like(y), y))
    folds: list[list[int]] = [[] for _ in range(n_splits)]
    for cls in np.unique(y):
        for j, idx in enumerate(np.nonzero(y == cls)[0]):
            folds[j % n_splits].append(int(idx))
    if any(not f for f in folds):
        raise ValueError(
            f"n_splits={n_splits} is greater than the number of members in "
            "the smallest class"
        )
    out = []
    for k in range(n_splits):
        dev = np.array(sorted(folds[k]), dtype=np.int64)
        train = np.array(
            sorted(set(range(len(y))) - set(folds[k])), dtype=np.int64
        )
        out.append((train, dev))
    return out


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--annot_path', default='.')
    parser.add_argument('--n_splits', type=int, default=5)
    parser.add_argument('--seed', type=int, default=123)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_arguments(argv)
    annot_path = args.annot_path
    split_file = os.path.join(annot_path, 'splits', 'splits', 'train.split1.bundle')
    split_content = read_lines(split_file, offset_start=1)

    action_ids: dict[str, int] = {}
    x, y, c = [], [], []
    for filepath in split_content:
        stem = os.path.splitext(filepath[19:])[0]
        parts = stem.split('_')
        action, camera = parts[-1], parts[1]
        action_ids.setdefault(action, len(action_ids))
        x.append(filepath)
        y.append(action_ids[action])
        c.append(camera)

    x, y, c = np.array(x), np.array(y), np.array(c)
    print(action_ids)

    out_dir = os.path.join(annot_path, 'splits', 'new_splits')
    os.makedirs(out_dir, exist_ok=True)
    stats_lines = []
    for part_idx, (train_index, dev_index) in enumerate(
        stratified_kfold_indices(y, args.n_splits, args.seed)
    ):
        train_action = collections.Counter(y[train_index].tolist())
        dev_action = collections.Counter(y[dev_index].tolist())
        lines = [
            f'Partition  {part_idx}',
            f'Train action  {train_action}',
            f'Dev action  {dev_action}',
            f'Train cameras  {collections.Counter(c[train_index].tolist())}',
            f'Dev cameras  {collections.Counter(c[dev_index].tolist())}',
        ]
        for line in lines:
            print(line)
        stats_lines += lines

        for part, counter, idx in (
            ('train', train_action, train_index),
            ('dev', dev_action, dev_index),
        ):
            # NB: the reference CODE omits this newline (data_splitting.py:103)
            # which would glue the first path onto the header; its CHECKED-IN
            # bundles have the header on its own line (splits/new_splits/
            # train.split0.bundle line 1) — the artifact format is the
            # contract the readers consume, so we write the newline.
            path = os.path.join(out_dir, f'{part}.split{part_idx}.bundle')
            with open(path, 'w') as f:
                f.write('# ' + str(counter) + '\n')
                for filepath in x[idx]:
                    f.write(filepath + '\n')

    with open(os.path.join(out_dir, 'split_statistics.txt'), 'w') as f:
        f.write('\n'.join(stats_lines) + '\n')
