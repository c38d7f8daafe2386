"""Fixed-shape padded batch collation for XLA.

The reference pads each batch to its exact max length (``train.py:183-205``),
giving hundreds of distinct sequence lengths => a compile storm under ``jit``.
We round the padded length up to a small set of bucket lengths (multiples of
``bucket_multiple``, default 128 — MXU/VPU lane-friendly and few distinct XLA
programs), and carry an explicit validity mask.  Padded frames are zeros and
padded target entries are ``TARGET_PAD`` (-1), so masked losses/metrics are
unchanged; ``bucket_multiple=1`` reproduces exact-length padding.

Target semantics (reference ``train.py:189-204``):
* ``pred_mode != 'cont'``  -> one target per instance (segment classification),
* ``pred_mode == 'cont'``  -> per-frame targets padded with -1; under
  ``train_mode == 'segment'`` the single segment label is repeated over the
  clip's frames.
Targets are flattened to ``[B * y_len]`` like the reference.
"""

from __future__ import annotations

import numpy as np

from .. import N_FEAT, TARGET_PAD


def bucket_length(length: int, bucket_multiple: int = 128, min_len: int = 0) -> int:
    length = max(length, min_len, 1)
    if bucket_multiple <= 1:
        return length
    return -(-length // bucket_multiple) * bucket_multiple


def pad_batch(
    batch: list[tuple[np.ndarray, np.ndarray]],
    batchsize: int | None = None,
    pred_mode: str = "cont",
    train_mode: str = "active",
    bucket_multiple: int = 128,
):
    """Collate ``[(features [T,400], labels [T] or [1] or [0]), ...]``.

    Returns ``(padded [B,T_pad,400] f32, lengths [B] i32, targets [B*y_len] i64,
    mask [B,T_pad] bool)``.
    """
    xs = [np.asarray(item[0], dtype=np.float32) for item in batch]
    ys = [np.asarray(item[1]) for item in batch]
    b = batchsize if batchsize is not None else len(batch)
    x_len = np.array([x.shape[0] for x in xs], dtype=np.int32)
    t_pad = bucket_length(int(x_len.max()), bucket_multiple)

    padded = np.zeros((b, t_pad, N_FEAT), dtype=np.float32)
    if pred_mode != "cont":
        y_len = 1
    else:
        y_len = t_pad
    targets = np.full((b, y_len), TARGET_PAD, dtype=np.int64)
    lengths = np.zeros((b,), dtype=np.int32)
    lengths[: len(xs)] = x_len

    for i, (x, y) in enumerate(zip(xs, ys)):
        l = x.shape[0]
        padded[i, :l] = x
        if y.size == 0:
            continue  # test part: no labels
        if pred_mode != "cont":
            targets[i, :] = y.reshape(-1)[0]
        else:
            cur = y
            if train_mode == "segment":
                cur = np.repeat(cur.reshape(-1)[0], l)
            targets[i, :l] = cur[:l]

    mask = (
        np.arange(t_pad, dtype=np.int32)[None, :] < lengths[:, None]
    )
    return padded, lengths, targets.reshape(-1), mask


class BatchFeed:
    """Minimal DataLoader replacement: sampler + collate over an in-RAM
    dataset.  No worker processes — the data already lives in host memory and
    collation is NumPy slicing; the expensive work happens on-device."""

    def __init__(
        self,
        dataset,
        batch_sampler=None,
        batch_size: int = 1,
        pred_mode: str = "cont",
        train_mode: str = "active",
        bucket_multiple: int = 128,
        shuffle: bool = False,
        seed: int | None = None,
    ):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.batch_size = batch_size
        self.pred_mode = pred_mode
        self.train_mode = train_mode
        self.bucket_multiple = bucket_multiple
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def index_batches(self):
        """One epoch of index batches (sampler-driven order/composition) —
        public so callers can key device-resident batch caches by
        composition (``cli/train_cli.py --cache_device``)."""
        if self.batch_sampler is not None:
            yield from self.batch_sampler
        else:
            order = np.arange(len(self.dataset))
            if self.shuffle:
                self._rng.shuffle(order)
            for i in range(0, len(order), self.batch_size):
                yield order[i : i + self.batch_size].tolist()

    def collate(self, idxs):
        """Collate one index batch to fixed-shape arrays."""
        batch = [self.dataset[i] for i in idxs]
        return pad_batch(
            batch,
            batchsize=len(idxs),
            pred_mode=self.pred_mode,
            train_mode=self.train_mode,
            bucket_multiple=self.bucket_multiple,
        )

    def __iter__(self):
        for idxs in self.index_batches():
            yield self.collate(idxs)

    def __len__(self) -> int:
        if self.batch_sampler is not None:
            return self.batch_sampler.batch_count()
        return -(-len(self.dataset) // self.batch_size)
