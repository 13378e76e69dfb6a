"""Pallas fused LBP histograms vs the XLA reference implementation."""

import numpy as np
import jax.numpy as jnp

from facerecognition_tpu.models.lbph import lbph_features
from facerecognition_tpu.ops.pallas_lbp import pallas_lbph_features_batch


def test_matches_xla_lbph_features(rng):
    grays = rng.integers(0, 256, (4, 60, 60)).astype(np.float32)
    fused = np.asarray(
        pallas_lbph_features_batch(jnp.asarray(grays), interpret=True)
    )
    for i in range(4):
        ref = np.asarray(lbph_features(jnp.asarray(grays[i])))
        np.testing.assert_allclose(fused[i], ref, atol=1e-6)


def test_custom_grid(rng):
    grays = rng.integers(0, 256, (2, 34, 34)).astype(np.float32)
    fused = np.asarray(
        pallas_lbph_features_batch(
            jnp.asarray(grays), grid_x=4, grid_y=4, interpret=True
        )
    )
    assert fused.shape == (2, 4 * 4 * 256)
    for i in range(2):
        ref = np.asarray(lbph_features(jnp.asarray(grays[i]), 1, 8, 4, 4))
        np.testing.assert_allclose(fused[i], ref, atol=1e-6)
