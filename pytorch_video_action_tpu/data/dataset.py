"""VideoDataset: in-memory Breakfast-features dataset.

Behavioral clone of the reference ``VideoDataset`` (``data_utils.py:66-290``)
as a plain Python container of NumPy arrays (no torch ``Dataset``; JAX feeds
from host NumPy directly).  Supported parts: train/dev/test; modes:

* ``cont``   — whole videos, labels as-is,
* ``active`` — SIL (class 0) frames removed (``data_utils.py:215-231``),
* ``segment``— SIL removed, then each video split into per-segment clips with
  a single label per clip (``data_utils.py:234-243``),
* ``None``   — raw (used by test-part inference).

Test part: loads ``segment.txt``, slices each feature matrix to
``[first_boundary:last_boundary]`` and re-bases boundaries to 0
(``data_utils.py:181-190``).
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.runlength import split_into_segments
from . import bundles, features as feat_io


class VideoDataset:
    def __init__(
        self,
        data_dir: str = "./data",
        annot_path: str = ".",
        part: str = "train",
        split: int = 3,
        load_all: bool = True,
        mode: str | None = "active",
        cache_dir: str = "data-comp",
        segment_file: str | None = None,
        use_native_io: bool = True,
        verbose: bool = True,
    ):
        self.part = part.lower().strip()
        self.split = split
        self.mode = mode
        self.data_dir = data_dir
        self.cache_dir = cache_dir
        self.use_native_io = use_native_io
        self._verbose = verbose
        if self.part not in ("train", "dev", "test"):
            raise ValueError("part must be one of train/dev/test")

        self.filenames = bundles.load_split_filenames(annot_path, self.part, split)
        self.class_mapping = bundles.load_class_mapping(annot_path)
        self.ground_truth_dir = os.path.join(annot_path, "groundTruth", "groundTruth")

        if self.part == "test":
            self._log("Load Segment file")
            seg_path = segment_file or os.path.join(annot_path, "segment.txt")
            if not os.path.exists(seg_path) and os.path.exists("./segment.txt"):
                seg_path = "./segment.txt"  # reference hardcodes cwd (data_utils.py:90)
            self.segment_lines: list[list[int]] = bundles.load_segment_file(seg_path)
        else:
            self.segment_lines = []

        # load_all is effectively forced in the reference train path
        # (train.py:45-47); we always materialize in RAM.
        self._log(f"Loading all {part} data...")
        self._load_all_data()
        self._log(f"{len(self.features)} {part} instances have been loaded.")

        if mode in ("active", "segment"):
            self._log("Excluding out SIL frames...")
            self.features, self.labels = exclude_label(self.features, self.labels, 0)
        if mode == "segment":
            self._log("Converting videos into segments...")
            self._turn_videos_to_segments()
            self._log(
                f"Data has been converted into {len(self.features)} {part} segments."
            )

    # ------------------------------------------------------------------ io

    def _log(self, msg: str) -> None:
        if self._verbose:
            print(msg)

    def _load_all_data(self) -> None:
        os.makedirs(self.cache_dir, exist_ok=True)
        feat_cache, label_cache = feat_io.cache_paths(
            self.cache_dir, self.part, self.split
        )
        if self.part == "test":
            cached = feat_io.load_cached(feat_cache)
            if cached is not None:
                self._log("Pickle files found. Loading from pickles")
                raw = cached
            else:
                self._log("Loading the data, please wait...")
                raw = [
                    feat_io.load_feature_file(
                        self.data_dir, fn, use_native=self.use_native_io
                    )
                    for fn in self.filenames
                ]
                feat_io.save_cache(feat_cache, raw)
            # slice to segment extent and re-base boundaries (data_utils.py:181-190)
            self.features = []
            for i, feature in enumerate(raw):
                segs = self.segment_lines[i]
                start, end = int(segs[0]), int(segs[-1])
                self.features.append(np.asarray(feature)[start:end, :])
                self.segment_lines[i] = [int(s) - start for s in segs]
            self.labels = None
        else:
            f_cached = feat_io.load_cached(feat_cache)
            l_cached = feat_io.load_cached(label_cache)
            if f_cached is not None and l_cached is not None:
                self._log("Pickle files found. Loading from pickles")
                self.features, self.labels = f_cached, l_cached
            else:
                self._log("Loading the data, please wait...")
                self.features, self.labels = [], []
                for fn in self.filenames:
                    self.features.append(
                        feat_io.load_feature_file(
                            self.data_dir, fn, use_native=self.use_native_io
                        )
                    )
                    self.labels.append(
                        bundles.load_label_file(
                            self.ground_truth_dir, self.class_mapping, fn
                        )
                    )
                feat_io.save_cache(feat_cache, self.features)
                feat_io.save_cache(label_cache, self.labels)

    # ------------------------------------------------------- transformations

    def _turn_videos_to_segments(self) -> None:
        segments: list[np.ndarray] = []
        labels: list[np.int64] = []
        for video, label in zip(self.features, self.labels):
            clips, seg_labels, _ = split_into_segments(np.asarray(video), label)
            segments.extend(clips)
            labels.extend(seg_labels)
        self.features = segments
        self.labels = [np.asarray(l, dtype=np.int64) for l in labels]

    # ------------------------------------------------------------- protocol

    def get_class_info(self) -> dict:
        return self.class_mapping.to_dict()

    @property
    def n_class(self) -> int:
        return self.class_mapping.n_class

    def __len__(self) -> int:
        return len(self.features if self.features is not None else self.filenames)

    def __getitem__(self, idx: int):
        data = np.asarray(self.features[idx], dtype=np.float32)
        if self.part == "test" or self.labels is None:
            label = np.zeros((0,), dtype=np.int64)
        else:
            label = np.atleast_1d(np.asarray(self.labels[idx], dtype=np.int64))
        return data, label


def exclude_label(features, labels, label) -> tuple[list, list]:
    """Delete all frames carrying ``label`` (reference ``_exclude_label``,
    ``data_utils.py:215-231``; the reference compares ``str(x) == str(label)``,
    equivalent to integer equality here)."""
    out_feats, out_labels = [], []
    for feats, labs in zip(features, labels):
        labs = np.asarray(labs)
        keep = labs != label
        out_labels.append(labs[keep])
        out_feats.append(np.asarray(feats)[keep])
    return out_feats, out_labels
