"""Orbax resume-bundle backend (``train/orbax_ckpt.py``): the sharded,
host-gather-free alternative to the npz bundles, dispatched by a ``*.orbax``
resume path.  The reference has no resume at all (its Adam restarts cold,
``/root/reference/train.py:345-349``); these tests pin the orbax backend to
the same bundle contract the npz tests pin (``test_training.py``), plus the
one thing npz cannot do: restoring a sharded train state directly onto its
``NamedSharding`` without a host gather."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_video_action_tpu.train import checkpoint as ckpt
from pytorch_video_action_tpu.train import orbax_ckpt
from pytorch_video_action_tpu.train.optim import make_optimizer


@pytest.fixture(autouse=True)
def _close_managers():
    yield
    orbax_ckpt.close()


def _params():
    return {
        "layer": {"w": jnp.arange(32.0).reshape(8, 4), "b": jnp.ones((4,))},
        "out": {"w": jnp.full((4, 3), 2.0)},
    }


def test_orbax_resume_roundtrip(tmp_path):
    """Same contract as the npz bundles: params + ordered optimizer leaves +
    epoch + extra + model_state round-trip through the ``.orbax`` dispatch
    in ``train/checkpoint.py``."""
    params = _params()
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    opt_state = tx.init(params)
    state = {"bn": {"mean": jnp.full((4,), 0.5)}}
    path = str(tmp_path / "bundle.orbax")

    ckpt.save_resume(path, params, opt_state, 5,
                     extra={"best": 12.5}, model_state=state)
    assert ckpt.peek_opt_layout(path) in ("flat", "per_leaf")

    bundle = ckpt.load_resume(path, opt_state_like=tx.init(params))
    assert bundle["epoch"] == 5
    assert bundle["extra"] == {"best": 12.5}
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(bundle["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(bundle["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(bundle["model_state"]["bn"]["mean"]),
        np.asarray(state["bn"]["mean"]))


def test_orbax_sharded_roundtrip(tmp_path):
    """Sharded save/restore: every array is written shard-by-shard from its
    devices and restored straight back onto the same ``NamedSharding`` (the
    capability the npz backend lacks — it gathers to host)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = Mesh(np.array(devs).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    params = {
        "w": jax.device_put(jnp.arange(64.0).reshape(8, 8), sh),
        "b": jax.device_put(jnp.ones((8,)), rep),
    }
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    opt_state = jax.jit(tx.init, out_shardings=None)(params)
    path = str(tmp_path / "sharded.orbax")
    ckpt.save_resume(path, params, opt_state, 2)

    abstract = orbax_ckpt.abstract_like(params, opt_state)
    bundle = orbax_ckpt.load_resume(path, opt_state_like=tx.init(params),
                                    abstract_state=abstract)
    w = bundle["params"]["w"]
    assert isinstance(w, jax.Array) and w.sharding == sh
    np.testing.assert_array_equal(np.asarray(w), np.asarray(params["w"]))
    assert bundle["params"]["b"].sharding == rep


def test_orbax_rolling_saves_latest_wins(tmp_path):
    """Consecutive saves to one ``.orbax`` root are rolling (max_to_keep=2):
    the latest bundle is what loads, and an older finalized bundle is never
    destroyed by an in-flight overwrite (orbax step dirs + tmp/rename)."""
    params = _params()
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    opt_state = tx.init(params)
    path = str(tmp_path / "roll.orbax")
    ckpt.save_resume(path, params, opt_state, 1, async_=True)
    p2 = jax.tree_util.tree_map(lambda a: a + 1.0, params)
    ckpt.save_resume(path, p2, opt_state, 2, async_=True)
    ckpt.flush()
    bundle = ckpt.load_resume(path, opt_state_like=tx.init(params))
    assert bundle["epoch"] == 2
    np.testing.assert_array_equal(np.asarray(bundle["params"]["out"]["w"]),
                                  np.asarray(p2["out"]["w"]))


def test_orbax_layout_mismatch_actionable(tmp_path):
    """Loading a bundle saved under the other PVA_FLAT_OPT layout fails with
    the same actionable message the npz backend gives."""
    params = _params()
    tx_flat, _ = make_optimizer(1e-3, 30, 1.0, flat=True)
    tx_leaf, _ = make_optimizer(1e-3, 30, 1.0, flat=False)
    path = str(tmp_path / "layout.orbax")
    ckpt.save_resume(path, params, tx_flat.init(params), 1,
                     opt_layout="flat")
    with pytest.raises(ValueError, match="PVA_FLAT_OPT"):
        ckpt.load_resume(path, opt_state_like=tx_leaf.init(params))
    assert ckpt.peek_opt_layout(path) == "flat"


def test_has_resume_empty_orbax_root_is_fresh_start(tmp_path):
    """An orbax manager root with zero finalized steps (run killed during
    its first async save) must NOT count as resumable — has_resume gates the
    CLI so it falls through to a fresh start like the npz backend's atomic
    tmp-rename does (advisor finding, round 3)."""
    path = str(tmp_path / "empty.orbax")
    os.makedirs(path)  # root exists, no steps
    assert not ckpt.has_resume(path)
    # npz semantics unchanged: missing file -> False, real file -> True
    assert not ckpt.has_resume(str(tmp_path / "missing.npz"))
    params = _params()
    tx, _ = make_optimizer(1e-3, 30, 1.0)
    npz = str(tmp_path / "real.npz")
    ckpt.save_resume(npz, params, tx.init(params), 1)
    assert ckpt.has_resume(npz)
    # and once a step finalizes, the orbax root becomes resumable
    ckpt.save_resume(path, params, tx.init(params), 1)
    ckpt.flush()
    assert ckpt.has_resume(path)


def test_orbax_cli_resume(synthetic_root, tmp_path, monkeypatch):
    """`--resume foo.orbax` trains, saves rolling orbax bundles, and a second
    invocation resumes from the stored epoch (skips completed epochs)."""
    from pytorch_video_action_tpu.cli.train_cli import main as train_main

    monkeypatch.chdir(tmp_path)
    argv = [
        "--model", "simple_fc", "--epoch", "2", "--batchsize", "2",
        "--seed", "3", "--resume", "bundle.orbax",
        "--data_dir", os.path.join(str(synthetic_root), "data"),
        "--annot_path", str(synthetic_root),
        "--bucket_multiple", "32",
    ]
    train_main(argv)
    assert os.path.isdir("bundle.orbax")
    bundle = ckpt.load_resume("bundle.orbax")
    assert bundle["epoch"] == 2
    # resume: completed epochs are skipped, params carry over unchanged
    orbax_ckpt.close()
    train_main(argv)
    bundle2 = ckpt.load_resume("bundle.orbax")
    assert bundle2["epoch"] == 2
