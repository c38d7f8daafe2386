"""Host-side segment voting primitives shared by the inference drivers.

These decide segment accuracy at the margin, so semantics follow the
reference precisely (SURVEY.md §7 hard-part 4):

* majority vote = ``bincount`` argmax -> lowest label index on ties,
* zero-avoidance second choice (``inference.py:147-148``): the reference's
  literal code is ``argsort(bincount)[1]`` — the label with the *second
  smallest* count, almost certainly a bug for the intended "next highest".
  Default here is the intended second-most-frequent; ``quirk_argsort1=True``
  reproduces the literal reference behavior,
* cross-model mode with the reference's tie-breaks (``inference.py:159-179``,
  matching pre-3.8 ``statistics.mode`` which raised on ties).
"""

from __future__ import annotations

from collections import Counter

import numpy as np


def majority_vote(pred_segment: np.ndarray) -> int:
    return int(np.bincount(pred_segment).argmax())


def zero_avoided_vote(pred_segment: np.ndarray, quirk_argsort1: bool = False) -> int:
    counts = np.bincount(pred_segment)
    vote = int(counts.argmax())
    if vote == 0 and counts.shape[0] > 1:
        if quirk_argsort1:
            vote = int(np.argsort(counts, kind="stable")[1])
        else:
            # intended: second-most-frequent label
            vote = int(np.argsort(-counts, kind="stable")[1])
    return vote


def model_segment_result(
    preds: np.ndarray,
    maxp: np.ndarray,
    start: int,
    end: int,
    video_prob_sum: float,
    quirk_argsort1: bool = False,
) -> tuple[int, float, int]:
    """One model's vote on one segment: (label, confidence, n_agreeing_frames).

    Confidence = mean over agreeing frames of the per-frame max log-prob
    normalized by the *whole video's* sum of maxes (``inference.py:142,152-153``).
    """
    seg_preds = preds[start:end]
    label = zero_avoided_vote(seg_preds, quirk_argsort1)
    agree = np.nonzero(seg_preds == label)[0]
    norm = maxp[start:end] / video_prob_sum
    conf = float(norm[agree].mean()) if agree.size else 0.0
    return label, conf, int(agree.size)


def select_across_models(
    labels: list[int],
    probabilities: list[float],
    frames: list[int],
    prob_pref: str,
) -> int:
    """Cross-model selection (``inference.py:159-179``): modal label; on a
    tie for most-common, prefer by frame count (unless all equal, then by
    probability per ``prob_pref`` in {'big','small'}).  Empty -> 0 (the
    reference's 'Blank prediction' path)."""
    if not labels:
        return 0
    counts = Counter(labels)
    top = max(counts.values())
    modal = [l for l, c in counts.items() if c == top]
    if len(modal) == 1:
        return modal[0]
    if len(set(frames)) == 1:
        if prob_pref == "big":
            idx = probabilities.index(max(probabilities))
        else:
            idx = probabilities.index(min(probabilities))
    else:
        idx = frames.index(max(frames))
    return labels[idx]


def candidate_labels(
    seg_preds: np.ndarray, threshold: float
) -> np.ndarray:
    """Above-threshold candidate labels for beam search
    (``inference-lm.py:143-151`` / ``train.py:114-119``): min-max-normalized
    bincount (with the reference's ``10e-6`` constant), sorted by descending
    count, thresholded."""
    counts = np.bincount(seg_preds)
    cmin, cmax = counts.min(), counts.max()
    prob = (counts - cmin) / (10e-6 + cmax - cmin)
    order = np.argsort(-counts, kind="stable")
    keep = prob[order] > threshold
    return order[keep]
