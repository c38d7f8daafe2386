"""Run-length utilities over frame-label sequences.

The reference re-declares this logic in 5+ places with slight drift
(``train.py:70-83``, ``inference.py:49-62``, ``inference-lm.py:54-67``,
``data_utils.py:246-262``, ``lm_generation.py:24-33``).  Here it lives once.

Semantics (shared by every reference copy): walk the label sequence, and each
time the label changes emit the previous run.  ``boundaries`` always starts
with 0 and ends with ``len(labels)``, so ``len(boundaries) == len(labels_rle)+1``
and segment ``i`` spans ``[boundaries[i], boundaries[i+1])``.
"""

from __future__ import annotations

import numpy as np


def run_length_segments(labels) -> tuple[list, list[int]]:
    """Collapse a frame-label sequence into (segment_labels, boundaries).

    Equivalent to the reference ``get_label_length_seq(content)``
    (``train.py:70-83``): returns the per-segment labels and the frame indices
    at which segments start, terminated by the total length.
    """
    labels = list(labels)
    seg_labels: list = []
    boundaries: list[int] = [0]
    if not labels:
        boundaries.append(0)
        return seg_labels, boundaries
    start = 0
    for i in range(len(labels)):
        if labels[i] != labels[start]:
            seg_labels.append(labels[start])
            boundaries.append(i)
            start = i
    seg_labels.append(labels[start])
    boundaries.append(len(labels))
    return seg_labels, boundaries


def segment_label_sequence(labels) -> list:
    """Only the collapsed per-segment labels (reference ``lm_generation.py:24-33``)."""
    seg_labels, _ = run_length_segments(labels)
    return seg_labels


def split_into_segments(frames: np.ndarray, labels) -> tuple[list[np.ndarray], list, list[int]]:
    """Split a video into per-segment clips (reference ``data_utils.py:246-262``).

    Returns (frame_clips, segment_labels, boundaries).
    """
    seg_labels, boundaries = run_length_segments(labels)
    clips = [
        frames[boundaries[i] : boundaries[i + 1]] for i in range(len(seg_labels))
    ]
    return clips, seg_labels, boundaries
