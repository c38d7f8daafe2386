import os

# Simulate an 8-device mesh on CPU for sharding tests (JAX-native fake backend).
# Must run before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    """A tiny Breakfast-shaped dataset tree shared across the test session."""
    from synthetic import make_synthetic_tree

    root = tmp_path_factory.mktemp("bfdata")
    make_synthetic_tree(root, seed=0)
    return root


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
