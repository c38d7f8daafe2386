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


def _kfold_test_chunks(n: int, k: int):
    """Test-index chunks of ``KFold(k, shuffle=False)`` over ``range(n)``:
    contiguous, the first ``n % k`` chunks one element larger."""
    sizes = np.full(k, n // k)
    sizes[: n % k] += 1
    bounds = np.cumsum(np.concatenate([[0], sizes]))
    return [np.arange(bounds[i], bounds[i + 1]) for i in range(k)]


def stratified_kfold_indices(y: np.ndarray, n_splits: int, seed: int = 123):
    """Stratified K-fold reproducing the reference's checked-in fold files
    BYTE-FOR-BYTE (``tests/test_data_layer.py::
    test_data_splitting_reproduces_reference_folds_byte_exact``).

    The reference calls ``StratifiedKFold(5, random_state=123)`` with
    ``shuffle=False`` (``data_splitting.py:68``), on which random_state is
    inert — but sklearn CHANGED the unshuffled stratification algorithm in
    0.22, so the installed sklearn assigns different folds than the ones the
    reference checked in (same class balance, different members; verified
    empirically).  The artifacts are the contract, so this reimplements the
    reference-era (<0.22) algorithm directly: per class, ``KFold(k)`` over
    ``max(count, k)`` padded positions, interleaved fold-major — no sklearn
    dependency, fully deterministic.

    Raises like sklearn does when ``n_splits`` exceeds the smallest class
    count (every class must appear in every fold's train side)."""
    del seed  # kept in the signature for the reference's CLI surface
    unique_y = np.unique(y)
    y_counts = np.array([int(np.sum(y == cls)) for cls in unique_y])
    if n_splits > y_counts.min():
        raise ValueError(
            f"n_splits={n_splits} cannot be greater than the number of "
            f"members in each class."
        )
    test_folds = np.empty(len(y), dtype=np.int64)
    per_cls = [_kfold_test_chunks(max(c, n_splits), n_splits)
               for c in y_counts]
    for fold_i in range(n_splits):
        for cls_i, cls in enumerate(unique_y):
            cls_idx = np.nonzero(y == cls)[0]
            ts = per_cls[cls_i][fold_i]
            ts = ts[ts < len(cls_idx)]
            test_folds[cls_idx[ts]] = fold_i
    return [
        (np.nonzero(test_folds != i)[0], np.nonzero(test_folds == i)[0])
        for i in range(n_splits)
    ]


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
