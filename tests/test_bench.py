"""Smoke tests for the headline bench's pipeline builder (bench.py).

The bench itself runs on the TPU; these pin the GRAPH on the CPU test
mesh — in particular the --max-faces crowd path (full in-graph NMS, M
slots aligned/embedded/matched per frame), which must stay jittable and
finite whatever the detector finds.
"""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.mark.slow
def test_multiface_pipeline_compiles_and_is_finite():
    import bench

    fn = bench.build_pipeline(max_faces=2)
    rng = np.random.default_rng(0)

    from facerecognition_tpu.training.synthetic_faces import scene_batch

    frames, _, _, valid = scene_batch(rng, 2, 128, max_faces=2, p_face=1.0)
    stack = jnp.asarray(frames.astype(np.float32)[None])  # (K=1, B, H, W, 3)
    gal = rng.normal(size=(32, 512)).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)

    checksum = float(fn(stack, jnp.asarray(gal)))
    assert np.isfinite(checksum)
    assert valid.sum() >= 2  # scenes actually contain faces
