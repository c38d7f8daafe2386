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

import json
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np

# in-flight async checkpoint writers (join via flush())
_PENDING: list[threading.Thread] = []
_PENDING_LOCK = threading.Lock()
# first background-write failure (e.g. disk full); surfaced by flush() so a
# checkpoint logged as saved can't silently not exist on disk
_WRITE_ERROR: list[BaseException] = []


def _atomic_savez(path: str, flat: dict) -> None:
    """Write-then-rename: a preemption (or second SIGTERM) landing mid-write
    never corrupts an existing bundle — the old file survives until the new
    one is fully on disk."""
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:  # file object: savez won't append '.npz'
            np.savez(f, **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _write(path: str, flat: dict, async_: bool) -> None:
    if not async_:
        # a later synchronous save must land after any in-flight async one
        # (e.g. the preemption save racing the previous epoch's resume
        # bundle) — drain first so the newest state wins the rename.  If an
        # EARLIER async write failed, still land this save (it may be the
        # final preemption bundle) before re-raising.
        try:
            flush()
        except RuntimeError:
            _atomic_savez(path, flat)
            raise
        _atomic_savez(path, flat)
        return
    with _PENDING_LOCK:
        prev = _PENDING[-1] if _PENDING else None

        def run():
            try:
                if prev is not None:
                    prev.join()  # serialize: older writes land first
                _atomic_savez(path, flat)
            except BaseException as e:  # noqa: BLE001 — surfaced via flush()
                with _PENDING_LOCK:
                    if not _WRITE_ERROR:
                        _WRITE_ERROR.append(e)

        t = threading.Thread(target=run, daemon=True)
        _PENDING.append(t)
        # start while holding the lock: a concurrent _write may capture this
        # thread as `prev` the moment the lock drops, and joining a
        # never-started thread raises RuntimeError (advisor finding, round 2)
        t.start()


def flush() -> None:
    """Join all in-flight async checkpoint writes (call before process exit
    or before re-reading a bundle just saved).  Re-raises the first
    background-write failure, so callers learn a 'saved' checkpoint never
    landed on disk."""
    with _PENDING_LOCK:
        pending, _PENDING[:] = _PENDING[:], []
    for t in pending:
        t.join()
    # orbax backend: join its async saves too (raises on write failure) —
    # inside try/finally so an orbax exception cannot shadow a recorded npz
    # write failure (advisor finding, round 3)
    import sys

    try:
        orbax_mod = sys.modules.get(f"{__package__}.orbax_ckpt")
        if orbax_mod is not None:
            orbax_mod.flush()
    finally:
        with _PENDING_LOCK:
            if _WRITE_ERROR:
                err = _WRITE_ERROR.pop(0)
                _WRITE_ERROR.clear()
                raise RuntimeError(
                    f"async checkpoint write failed: {err!r}") from err


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


def save_params(path: str, params, model_state=None, async_: bool = False) -> None:
    """Params (+ optional non-trainable model state, e.g. bilstm_lm's
    BatchNorm running stats — the reference's ``state_dict()`` includes
    running_mean/var, so ours must round-trip them too).

    ``async_=True`` fetches to host synchronously (cheap — the arrays are
    already materialized at epoch end) and writes on a background thread so
    training never stalls on disk; join via ``flush()``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(params))
    if model_state is not None:
        flat.update({
            _STATE_PREFIX + k: v
            for k, v in _flatten(jax.device_get(model_state)).items()
        })
    if not path.endswith(".npz"):
        path = path + ".npz"
    _write(path, flat, async_)


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


def _is_orbax(path: str) -> bool:
    """``*.orbax`` resume paths dispatch to the orbax backend
    (``train/orbax_ckpt.py``): sharded, host-gather-free bundles for mesh
    runs; the npz file backend stays the single-chip default."""
    return path.endswith(".orbax")


def save_resume(path: str, params, opt_state, epoch: int,
                extra: dict | None = None, model_state=None,
                async_: bool = False, opt_layout: str | None = None):
    """Full resumable bundle (params + optimizer state + progress) — a
    capability the reference lacks (its Adam restarts on resume).

    ``*.orbax`` paths route to the orbax backend (sharded arrays written
    shard-by-shard, no host gather — see ``train/orbax_ckpt.py``).

    npz format: one ``.npz`` (version-stable arrays, no pickled Python objects).
    Params/model_state flatten by pytree path; the optimizer state — an
    optax structure of namedtuples — is stored as ordered leaves and
    restored against a freshly initialized template (``opt_state_like``)."""
    if _is_orbax(path):
        from . import orbax_ckpt

        orbax_ckpt.save_resume(path, params, opt_state, epoch, extra=extra,
                               model_state=model_state, async_=async_,
                               opt_layout=opt_layout)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {
        f"params/{k}": v for k, v in _flatten(jax.device_get(params)).items()
    }
    if model_state is not None:
        flat.update({
            f"model_state/{k}": v
            for k, v in _flatten(jax.device_get(model_state)).items()
        })
    opt_leaves = jax.tree_util.tree_leaves(jax.device_get(opt_state))
    for i, leaf in enumerate(opt_leaves):
        flat[f"opt/{i:05d}"] = np.asarray(leaf)
    if opt_layout is None:
        from .optim import layout_name
        opt_layout = layout_name()
    flat["opt_layout"] = np.asarray(opt_layout)
    flat["epoch"] = np.asarray(epoch, dtype=np.int64)
    if extra:
        flat["extra_json"] = np.frombuffer(
            json.dumps(extra).encode(), dtype=np.uint8
        )
    _write(path, flat, async_)


def peek_opt_layout(path: str) -> str | None:
    """Read just the optimizer-state layout tag (``"flat"``/``"per_leaf"``)
    from a resume bundle, or None for pre-tag bundles.  Lets the CLI build a
    matching optimizer BEFORE loading (``cli/train_cli.py``), so resuming a
    bundle saved under the other ``PVA_FLAT_OPT`` setting just works."""
    if _is_orbax(path):
        from . import orbax_ckpt

        return orbax_ckpt.peek_opt_layout(path)
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        if "opt_layout" in z.files:
            return str(z["opt_layout"])
    return None


def has_resume(path: str) -> bool:
    """True iff ``path`` holds a LOADABLE resume bundle.  For orbax paths
    the manager root can exist with zero finalized steps (a run killed
    during its first async save); treating that as resumable crashed with
    FileNotFoundError where the npz backend's atomic tmp-rename leaves no
    file and starts fresh (advisor finding, round 3) — so peek for a
    finalized step instead of trusting the directory."""
    if not os.path.exists(path):
        return False
    if _is_orbax(path):
        from . import orbax_ckpt

        try:
            return orbax_ckpt.latest_step(path) is not None
        except Exception:
            return False
    return True


def load_resume(path: str, opt_state_like=None):
    """Load a resume bundle.  ``opt_state_like`` (a freshly initialized
    optimizer state of the same optimizer) supplies the pytree structure the
    stored optimizer leaves are unflattened into; without it ``opt_state``
    is returned as the raw leaf list."""
    if _is_orbax(path):
        from . import orbax_ckpt

        return orbax_ckpt.load_resume(path, opt_state_like=opt_state_like)
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten({
        k[len("params/"):]: v for k, v in flat.items()
        if k.startswith("params/")
    })
    state_flat = {
        k[len("model_state/"):]: v for k, v in flat.items()
        if k.startswith("model_state/")
    }
    opt_leaves = [
        jnp.asarray(flat[k]) for k in sorted(flat) if k.startswith("opt/")
    ]
    if opt_state_like is not None:
        treedef = jax.tree_util.tree_structure(opt_state_like)
        if treedef.num_leaves != len(opt_leaves):
            stored = str(flat["opt_layout"]) if "opt_layout" in flat else None
            if stored is not None:
                raise ValueError(
                    f"resume bundle {path} stores optimizer state in the "
                    f"'{stored}' layout ({len(opt_leaves)} leaves) but the "
                    f"template expects {treedef.num_leaves} leaves — likely "
                    f"built under the other PVA_FLAT_OPT setting.  Set "
                    f"PVA_FLAT_OPT={'1' if stored == 'flat' else '0'}, or "
                    f"pass a template from make_optimizer(..., "
                    f"flat={stored == 'flat'})."
                )
            raise ValueError(
                f"optimizer state mismatch: bundle has {len(opt_leaves)} "
                f"leaves, template expects {treedef.num_leaves} "
                f"(different optimizer?)"
            )
        opt_state = jax.tree_util.tree_unflatten(treedef, opt_leaves)
    else:
        opt_state = opt_leaves
    extra = (
        json.loads(bytes(flat["extra_json"]).decode())
        if "extra_json" in flat else {}
    )
    return {
        "params": params,
        "opt_state": opt_state,
        "epoch": int(flat["epoch"]),
        "extra": extra,
        "model_state": _unflatten(state_flat) if state_flat else None,
    }
