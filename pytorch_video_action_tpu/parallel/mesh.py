"""Device mesh construction.

The reference has no distributed layer at all (SURVEY.md §2.6); parallelism
here is new, TPU-native design: a ``jax.sharding.Mesh`` with axes

* ``data`` — batch-axis data parallelism (the primary axis: models are small,
  batches of bucketed videos shard cleanly),
* ``seq``  — optional sequence/context parallelism over the time axis for
  time-local models (MS-TCN dilated convs with halo exchange; windowed/ring
  attention).

Collectives are XLA's (``psum``/``all_gather``/``ppermute``) riding ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, seq: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // seq
    n = data * seq
    if n > len(devices):
        raise ValueError(f"mesh {data}x{seq} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(data, seq)
    return Mesh(arr, axis_names=("data", "seq"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def batch_seq_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data", "seq"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
