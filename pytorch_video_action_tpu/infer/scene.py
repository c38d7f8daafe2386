"""Cross-camera scene aggregation (reference ``inference-scene.py``).

Scene key = ``filename.split('_')[2] + '_' + filename.split('_')[3]``
(person_activity, ``inference-scene.py:78-84``); after per-video ensemble
voting, each segment index is re-voted across the scene's camera views with
frame-count / min-probability tie-breaks (``inference-scene.py:156-178``).
Note the scene driver records *all* per-video labels (no zero filter, unlike
``inference.py``) and its cross-camera tie-break always uses min probability.
"""

from __future__ import annotations

import numpy as np

from .predict import frame_predictions
from .voting import model_segment_result, select_across_models


def scene_key(filename: str) -> str:
    parts = filename.split("_")
    return parts[2] + "_" + parts[3]


def group_by_scene(filenames: list[str]) -> dict[str, list[int]]:
    groups: dict[str, list[int]] = {}
    for index, filename in enumerate(filenames):
        groups.setdefault(scene_key(filename), []).append(index)
    return groups


def _per_video_labels(
    dataset, models, all_preds, video_index, prob_pref, quirk_argsort1
):
    """One camera-video's per-segment ensemble labels plus the aggregation
    statistics the scene vote uses (``inference-scene.py:100-155``)."""
    segments = dataset.segment_lines[video_index]
    seg_votes: list[dict] = [
        {"label": [], "probability": [], "no_of_frames": []}
        for _ in range(max(len(segments) - 1, 0))
    ]
    for key in models:
        preds, maxp = all_preds[key][video_index]
        prob_sum = float(maxp.sum())
        for s in range(len(segments) - 1):
            start, end = int(segments[s]), int(segments[s + 1])
            label, conf, n_frames = model_segment_result(
                preds, maxp, start, end, prob_sum, quirk_argsort1
            )
            # no zero filter here (deliberate reference difference)
            seg_votes[s]["label"].append(label)
            seg_votes[s]["probability"].append(conf)
            seg_votes[s]["no_of_frames"].append(n_frames)

    labels, frames, probs = [], [], []
    for votes in seg_votes:
        from collections import Counter

        counts = Counter(votes["label"])
        top = max(counts.values())
        modal = [l for l, c in counts.items() if c == top]
        if len(modal) == 1:
            # clean mode: sentinel stats (inference-scene.py:138-140)
            labels.append(modal[0])
            frames.append(1000)
            probs.append(0.0)
        else:
            label = select_across_models(
                votes["label"], votes["probability"], votes["no_of_frames"], prob_pref
            )
            labels.append(label)
            frames.append(max(votes["no_of_frames"]))
            probs.append(min(votes["probability"]))
    return labels, frames, probs


def aggregate_scene(per_camera: list[tuple[list, list, list]]) -> list[int]:
    """Vote per segment index across camera views
    (``inference-scene.py:156-178``)."""
    from collections import Counter

    n_segments = len(per_camera[0][0])
    final = []
    for s in range(n_segments):
        labels = [cam[0][s] for cam in per_camera]
        frames = [cam[1][s] for cam in per_camera]
        probs = [cam[2][s] for cam in per_camera]
        counts = Counter(labels)
        top = max(counts.values())
        modal = [l for l, c in counts.items() if c == top]
        if len(modal) == 1:
            final.append(modal[0])
        else:
            if len(set(frames)) == 1:
                idx = probs.index(min(probs))  # always min (reference :173)
            else:
                idx = frames.index(max(frames))
            final.append(labels[idx])
    return final


def run_scene_aggregation(
    dataset,
    models: dict,
    prob_pref: str = "big",
    quirk_argsort1: bool = False,
    bucket_multiple: int = 128,
    batch_size: int = 8,
    verbose: bool = True,
    sharding=None,
    dtype: str | None = None,
) -> list[int]:
    """Returns the flat ordered label list: for each test video (bundle
    order), its scene's aggregated per-segment labels
    (``inference-scene.py:183-189``)."""
    all_preds = {
        key: frame_predictions(
            mdef, params, dataset.features,
            bucket_multiple=bucket_multiple, batch_size=batch_size,
            sharding=sharding, dtype=dtype,
        )
        for key, (mdef, params) in models.items()
    }
    scenes = group_by_scene(dataset.filenames)
    scene_labels: dict[str, list[int]] = {}
    for i, (key, video_indices) in enumerate(scenes.items()):
        if verbose and i % 5 == 0:
            print(f"{i} out of {len(scenes)}")
        per_camera = [
            _per_video_labels(
                dataset, models, all_preds, vi, prob_pref, quirk_argsort1
            )
            for vi in video_indices
        ]
        scene_labels[key] = aggregate_scene(per_camera)

    flat: list[int] = []
    for filename in dataset.filenames:
        flat.extend(scene_labels[scene_key(filename)])
    return flat
