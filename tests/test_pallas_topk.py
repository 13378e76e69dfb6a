"""Pallas streaming top-k kernel vs dense reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from facerecognition_tpu.ops.pallas_topk import pallas_cosine_topk


def _ref_topk(q, g, k):
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    full = qn @ gn.T
    idx = np.argsort(-full, axis=1)[:, :k]
    return np.take_along_axis(full, idx, 1), idx


def test_matches_dense_multi_tile(rng):
    q = rng.normal(size=(8, 128)).astype(np.float32)
    g = rng.normal(size=(1024, 128)).astype(np.float32)
    s, i = pallas_cosine_topk(
        jnp.asarray(q), jnp.asarray(g), k=5, tile=256, interpret=True
    )
    rs, ri = _ref_topk(q, g, 5)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_allclose(np.asarray(s), rs, atol=1e-5)


def test_padding_path(rng):
    # N not divisible by tile → padded rows must never win
    q = rng.normal(size=(4, 64)).astype(np.float32)
    g = rng.normal(size=(300, 64)).astype(np.float32)
    s, i = pallas_cosine_topk(
        jnp.asarray(q), jnp.asarray(g), k=3, tile=128, interpret=True
    )
    rs, ri = _ref_topk(q, g, 3)
    np.testing.assert_array_equal(np.asarray(i), ri)
    assert (np.asarray(i) < 300).all()


def test_single_tile(rng):
    q = rng.normal(size=(2, 32)).astype(np.float32)
    g = rng.normal(size=(64, 32)).astype(np.float32)
    s, i = pallas_cosine_topk(
        jnp.asarray(q), jnp.asarray(g), k=4, tile=64, interpret=True
    )
    rs, ri = _ref_topk(q, g, 4)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_padding_never_leaks_invalid_indices(rng):
    """All-negative real scores: zero-vector padding rows would win the
    top-k — their scores must be masked to -inf AND their indices clamped
    into range so names[i] can't IndexError (ADVICE r1)."""
    from facerecognition_tpu.ops.pallas_topk import pallas_cosine_topk

    d, n, tile = 32, 10, 8  # n % tile != 0 → 6 padding rows
    q = np.ones((3, d), np.float32)
    gallery = -np.abs(rng.normal(size=(n, d))).astype(np.float32)  # all cos < 0
    s, i = pallas_cosine_topk(
        jnp.asarray(q), jnp.asarray(gallery), k=5, tile=tile, interpret=True
    )
    s, i = np.asarray(s), np.asarray(i)
    assert (i >= 0).all() and (i < n).all(), i
    # every top-k entry is a real row: padding loses to any real score
    assert (s > -1e29).all(), s
    # exact agreement with dense top-k
    dense = (q / np.linalg.norm(q, axis=1, keepdims=True)) @ (
        gallery / np.linalg.norm(gallery, axis=1, keepdims=True)
    ).T
    for row in range(3):
        np.testing.assert_array_equal(i[row], np.argsort(-dense[row])[:5])

    # k > n: the surplus entries carry NEG_INF scores and in-range indices
    s2, i2 = pallas_cosine_topk(
        jnp.asarray(q), jnp.asarray(gallery[:3]), k=5, tile=tile, interpret=True
    )
    s2, i2 = np.asarray(s2), np.asarray(i2)
    assert (i2 >= 0).all() and (i2 < 3).all()
    assert (s2[:, 3:] < -1e29 + 1).all()
