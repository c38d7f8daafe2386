"""Checkpoint-name parsing and model loading for the inference drivers.

Contract (reference ``inference.py:81-105``): checkpoint filenames are
``{model}_{acc:.2f}_dev``; the model type is recovered with
``'_'.join(name.split('.')[0].split('_')[:-1])`` and the net is constructed
with **default** hyperparameters (which is why non-default training flags
break reference inference — preserved as the documented contract).  The
reference's inference parsers never define ``--attn_head`` and crash on
``attn`` checkpoints (``inference.py:92``); we define it (deviation, README).
"""

from __future__ import annotations

import os

from ..models import INFERENCE_NAMES, ModelDef, build_model
from ..train.checkpoint import load_params


def parse_model_type(model_filename: str) -> str:
    return "_".join(model_filename.split(".")[0].split("_")[:-1])


def load_models(
    pretrained_names: list[str],
    n_class: int,
    models_dir: str = "models",
    attn_head: int = 4,
) -> dict[str, tuple[ModelDef, dict]]:
    """Returns {checkpoint_filename: (ModelDef, params)}, insertion-ordered
    (first model has voting priority, like the reference's dict ordering)."""
    out: dict[str, tuple[ModelDef, dict]] = {}
    for model_filename in pretrained_names:
        mtype = parse_model_type(model_filename)
        if mtype not in INFERENCE_NAMES:
            print(f"Unknown model type {mtype!r} for {model_filename}; skipping")
            continue
        mdef = build_model(mtype, n_class, attn_head=attn_head, defaults=True)
        path = os.path.join(models_dir, f"{model_filename}.npz")
        try:
            params = load_params(path)
        except Exception as e:
            print(e)
            print(f"Model {model_filename} not found in {path}!")
            continue
        out[model_filename] = (mdef, params)
        print(f"Load pretrained model: {model_filename}")
    return out
