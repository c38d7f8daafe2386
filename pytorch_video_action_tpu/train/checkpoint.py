"""Checkpointing with the reference naming contract.

Save path: ``models/{model}_{dev_acc:.2f}_dev.npz`` — the inference drivers
parse the model type back out of the filename exactly like the reference
(``'_'.join(fname.split('.')[0].split('_')[:-1])``, ``inference.py:82``), so
model names must not contain extra underscores beyond their canonical names.

Format: a flat ``.npz`` of ``/``-joined pytree paths -> float32 arrays.  The
reference never saves optimizer state (``train.py:345-349``); we additionally
support full resume bundles (params + opt state + epoch) via ``save_resume``.
"""

from __future__ import annotations

import io
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for path, value in flat.items():
        keys = path.split("/")
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(value)
    return _listify(root)


def _listify(node):
    """Convert dicts whose keys are 0..n-1 strings back into lists."""
    if not isinstance(node, dict):
        return node
    node = {k: _listify(v) for k, v in node.items()}
    keys = list(node.keys())
    if keys and all(k.isdigit() for k in keys):
        idx = sorted(int(k) for k in keys)
        if idx == list(range(len(idx))):
            return [node[str(i)] for i in idx]
    return node


def checkpoint_name(model: str, dev_acc: float) -> str:
    return f"{model}_{dev_acc:.2f}_dev"


_STATE_PREFIX = "__state__/"


def save_params(path: str, params, model_state=None) -> None:
    """Params (+ optional non-trainable model state, e.g. bilstm_lm's
    BatchNorm running stats — the reference's ``state_dict()`` includes
    running_mean/var, so ours must round-trip them too)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(params))
    if model_state is not None:
        flat.update({
            _STATE_PREFIX + k: v
            for k, v in _flatten(jax.device_get(model_state)).items()
        })
    np.savez(path, **flat)


def load_params(path: str, with_state: bool = False):
    """Returns params, or ``(params, model_state_or_None)`` when
    ``with_state`` (for stateful models)."""
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    state_flat = {
        k[len(_STATE_PREFIX):]: v
        for k, v in flat.items() if k.startswith(_STATE_PREFIX)
    }
    params = _unflatten(
        {k: v for k, v in flat.items() if not k.startswith(_STATE_PREFIX)}
    )
    if with_state:
        return params, (_unflatten(state_flat) if state_flat else None)
    return params


def save_resume(path: str, params, opt_state, epoch: int,
                extra: dict | None = None, model_state=None):
    """Full resumable bundle (params + optimizer state + progress) — a
    capability the reference lacks (its Adam restarts on resume)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
        "epoch": epoch,
        "extra": extra or {},
        "model_state": (
            jax.device_get(model_state) if model_state is not None else None
        ),
    }
    buf = io.BytesIO()
    pickle.dump(payload, buf)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_resume(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
