"""Test config: run the whole suite on a virtual 8-device CPU mesh.

Must set the env vars before the first `import jax` anywhere (pytest imports
conftest first, so this is the single chokepoint).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's TPU plugin (sitecustomize) force-sets
# jax_platforms at interpreter start; flip back to CPU for the suite.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def face_image(rng):
    """Synthetic 160x160 RGB uint8 'face' image."""
    return rng.integers(0, 256, size=(160, 160, 3), dtype=np.uint8)
