"""Tests for the matmul+top_k gallery matcher."""

import numpy as np
import jax.numpy as jnp

from facerecognition_tpu.ops.matcher import (
    compute_prototypes,
    cosine_similarity,
    cosine_topk,
    l2_normalize,
    pairwise_sq_dists,
)


def test_cosine_similarity_scalar():
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([1.0, 1.0, 0.0])
    assert abs(cosine_similarity(a, b) - 1 / np.sqrt(2)) < 1e-6
    assert cosine_similarity(a, np.zeros(3)) == 0.0


def test_topk_matches_numpy(rng):
    q = rng.normal(size=(7, 64)).astype(np.float32)
    g = rng.normal(size=(50, 64)).astype(np.float32)
    scores, idx = cosine_topk(jnp.asarray(q), jnp.asarray(g), k=5)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    full = qn @ gn.T
    ref_idx = np.argsort(-full, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(
        np.asarray(scores), np.take_along_axis(full, ref_idx, 1), atol=1e-5
    )


def test_l2_normalize(rng):
    x = rng.normal(size=(4, 16)).astype(np.float32)
    n = np.asarray(l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)


def test_prototypes(rng):
    emb = rng.normal(size=(10, 8)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 1, 2, 2, 2, 2, 0])
    protos = np.asarray(compute_prototypes(jnp.asarray(emb), jnp.asarray(labels), 4))
    for c in range(3):
        m = emb[labels == c].mean(0)
        m = m / np.linalg.norm(m)
        np.testing.assert_allclose(protos[c], m, atol=1e-5)
    np.testing.assert_allclose(protos[3], 0.0)  # empty class


def test_pairwise_sq_dists(rng):
    a = rng.normal(size=(6, 12)).astype(np.float32)
    b = rng.normal(size=(9, 12)).astype(np.float32)
    d = np.asarray(pairwise_sq_dists(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-4)
