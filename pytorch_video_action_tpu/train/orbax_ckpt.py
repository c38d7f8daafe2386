"""Orbax resume-bundle backend: sharded, host-gather-free checkpointing.

The default ``.npz`` bundles (``train/checkpoint.py``) ``jax.device_get``
the whole tree — correct on one chip, but on a multi-chip mesh that is a
full gather of every sharded parameter to one host.  Orbax writes each
array's shards directly from the devices that hold them (and restores them
back onto the same ``NamedSharding``), which is the idiomatic JAX/TPU
checkpoint path and scales to pod slices.  The reference has no resume at
all (its Adam restarts cold, ``train.py:345-349``); this backend extends
our npz bundle contract, it does not change it.

A ``*.orbax`` resume path is a ``CheckpointManager`` root directory: saves
land in monotonically numbered step subdirs with ``max_to_keep=2``, so the
previous bundle survives until the new one is finalized (orbax writes to a
tmp dir and renames — a kill mid-write never corrupts anything, the same
guarantee the npz writer hand-rolls).  Contract parity with the npz
backend (same call signatures, dispatched by path suffix in
``train/checkpoint.py``):

- bundles store params / ordered optimizer-state leaves / optional model
  state, plus ``{epoch, opt_layout, extra}`` metadata;
- ``load_resume(..., opt_state_like=)`` unflattens the stored leaves into
  the live optimizer template, with the same actionable ``PVA_FLAT_OPT``
  error on layout mismatch;
- async saves overlap training; failures surface on ``flush()``.
"""

from __future__ import annotations

import os

import jax

_MANAGERS: dict = {}  # path -> CheckpointManager (joined via flush())


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def _manager(path: str):
    ocp = _ocp()
    path = os.path.abspath(path)
    if path not in _MANAGERS:
        _MANAGERS[path] = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=2, enable_async_checkpointing=True
            ),
            item_names=("state", "meta"),
        )
    return _MANAGERS[path]


def _state_tree(params, opt_state, model_state):
    opt_leaves = jax.tree_util.tree_leaves(opt_state)
    state = {
        "params": params,
        "opt": {f"{i:05d}": leaf for i, leaf in enumerate(opt_leaves)},
    }
    if model_state is not None:
        state["model_state"] = model_state
    return state


def save_resume(path: str, params, opt_state, epoch: int,
                extra: dict | None = None, model_state=None,
                async_: bool = False, opt_layout: str | None = None) -> None:
    """Write a resume bundle under the manager root ``path`` (``*.orbax``).

    Arrays go to orbax as-is — sharded ``jax.Array``s are written shard-by-
    shard with their sharding recorded, no host gather.  ``async_=False``
    blocks until the bundle is durable (preemption save)."""
    ocp = _ocp()
    if opt_layout is None:
        from .optim import layout_name

        opt_layout = layout_name()
    meta = {"epoch": int(epoch), "opt_layout": opt_layout,
            "extra": extra or {}}
    mngr = _manager(path)
    step = (mngr.latest_step() or 0) + 1
    mngr.save(step, args=ocp.args.Composite(
        state=ocp.args.StandardSave(
            _state_tree(params, opt_state, model_state)),
        meta=ocp.args.JsonSave(meta),
    ))
    if not async_:
        mngr.wait_until_finished()


def flush() -> None:
    """Join in-flight async saves; re-raises the FIRST failure only after
    every manager has been joined (a raising manager must not leave later
    managers' writes un-awaited — advisor finding, round 3)."""
    first_err: BaseException | None = None
    for mngr in _MANAGERS.values():
        try:
            mngr.wait_until_finished()
        except BaseException as e:  # noqa: BLE001 — re-raised below
            if first_err is None:
                first_err = e
    if first_err is not None:
        raise first_err


def close() -> None:
    """Release managers (tests create many roots)."""
    for mngr in _MANAGERS.values():
        mngr.wait_until_finished()
        mngr.close()
    _MANAGERS.clear()


def latest_step(path: str) -> int | None:
    """Latest finalized step under the manager root, or None (e.g. a root
    created by a run killed during its first async save)."""
    if not os.path.isdir(path):
        return None
    return _manager(path).latest_step()


def peek_opt_layout(path: str) -> str | None:
    ocp = _ocp()
    if not os.path.isdir(path):
        return None
    mngr = _manager(path)
    step = mngr.latest_step()
    if step is None:
        return None
    r = mngr.restore(step, args=ocp.args.Composite(meta=ocp.args.JsonRestore()))
    return r.meta.get("opt_layout")


def load_resume(path: str, opt_state_like=None, abstract_state=None):
    """Restore the latest bundle.  ``abstract_state`` (optional) is a pytree
    of ``jax.ShapeDtypeStruct`` with shardings for the saved state layout
    (see ``abstract_like``) — pass it on a mesh so every array is restored
    directly onto its shards; without it arrays come back as host numpy
    (single-chip path)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    mngr = _manager(path)
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint steps under {path}")
    restore = (ocp.args.StandardRestore(abstract_state)
               if abstract_state is not None else ocp.args.StandardRestore())
    r = mngr.restore(step, args=ocp.args.Composite(
        state=restore, meta=ocp.args.JsonRestore()))
    state, meta = r.state, r.meta
    opt_leaves = [state["opt"][k] for k in sorted(state["opt"])]
    if opt_state_like is not None:
        treedef = jax.tree_util.tree_structure(opt_state_like)
        if treedef.num_leaves != len(opt_leaves):
            stored = meta.get("opt_layout")
            raise ValueError(
                f"resume bundle {path} stores optimizer state in the "
                f"'{stored}' layout ({len(opt_leaves)} leaves) but the "
                f"template expects {treedef.num_leaves} leaves — likely "
                f"built under the other PVA_FLAT_OPT setting.  Set "
                f"PVA_FLAT_OPT={'1' if stored == 'flat' else '0'}, or pass "
                f"a template from make_optimizer(..., flat={stored == 'flat'})."
            )
        opt_state = jax.tree_util.tree_unflatten(treedef, opt_leaves)
    else:
        opt_state = opt_leaves
    return {
        "params": state["params"],
        "opt_state": opt_state,
        "epoch": int(meta["epoch"]),
        "extra": meta.get("extra", {}),
        "model_state": state.get("model_state"),
    }


def abstract_like(params, opt_state, model_state=None):
    """Abstract state pytree for sharded restore: shapes/dtypes/shardings
    taken per-leaf from the live (sharded) arrays of a freshly initialized
    train state — restore then places every shard straight onto its device."""
    def leaf(a):
        sharding = a.sharding if isinstance(a, jax.Array) else None
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sharding)

    return jax.tree_util.tree_map(leaf,
                                  _state_tree(params, opt_state, model_state))
