import os

# Simulate an 8-device mesh on CPU for sharding tests (JAX-native fake
# backend).  The sandbox's sitecustomize pre-imports jax and pins the 'axon'
# TPU platform regardless of JAX_PLATFORMS, so the env var alone is not
# enough: we must also flip jax's config before any backend initializes.
# Unit tests verify numerics in f32 on CPU; the real TPU path is exercised by
# bench.py / __graft_entry__.py.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

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
