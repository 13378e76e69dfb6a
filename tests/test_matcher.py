"""Tests for the matmul+top_k gallery matcher."""

import numpy as np
import pytest
import jax.numpy as jnp

from facerecognition_tpu.ops.matcher import (
    compute_prototypes,
    cosine_similarity,
    cosine_topk,
    cosine_topk_int8,
    l2_normalize,
    pairwise_sq_dists,
    quantize_embeddings_int8,
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


def test_blocked_topk_exact_vs_lax(rng):
    """The blocked large-N reduction inside cosine_topk must equal
    lax.top_k exactly — values AND indices, including lowest-index
    tie-breaking and non-multiple-of-block sizes."""
    import jax

    from facerecognition_tpu.ops.matcher import _topk_lastdim

    # large N (blocked path), deliberately not a multiple of 1024
    s = rng.normal(size=(5, 9000)).astype(np.float32)
    # plant cross-block ties: same value in blocks 0, 3, 6
    s[:, 100] = s[:, 3 * 1024 + 7] = s[:, 6 * 1024 + 11] = 99.0
    v, i = _topk_lastdim(jnp.asarray(s), 5)
    rv, ri = jax.lax.top_k(jnp.asarray(s), 5)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    # small N falls through to lax.top_k
    s2 = rng.normal(size=(3, 500)).astype(np.float32)
    v2, i2 = _topk_lastdim(jnp.asarray(s2), 4)
    rv2, ri2 = jax.lax.top_k(jnp.asarray(s2), 4)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ri2))


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


def test_quantize_int8_roundtrip(rng):
    x = rng.normal(size=(32, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q, s = quantize_embeddings_int8(jnp.asarray(x))
    assert np.asarray(q).dtype == np.int8
    deq = np.asarray(q, np.float32) * (np.asarray(s)[:, None] / 127.0)
    # max-abs symmetric quantization: error <= half a step per component
    step = np.asarray(s)[:, None] / 127.0
    assert np.all(np.abs(deq - x) <= 0.5 * step + 1e-7)
    # zero rows stay zero with scale 0
    qz, sz = quantize_embeddings_int8(jnp.zeros((2, 8)))
    assert float(np.abs(np.asarray(qz)).sum()) == 0.0
    np.testing.assert_array_equal(np.asarray(sz), 0.0)


def test_cosine_topk_int8_agrees_with_dense(rng):
    """Clustered unit-norm embeddings (the real workload): int8 scores are
    within ~1e-2 of dense f32 and the top-1 pick agrees everywhere the
    margin is non-degenerate."""
    centers = rng.normal(size=(40, 128)).astype(np.float32)
    g = centers + 0.05 * rng.normal(size=centers.shape).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = centers[:16] + 0.05 * rng.normal(size=(16, 128)).astype(np.float32)

    s_ref, i_ref = cosine_topk(jnp.asarray(q), jnp.asarray(g), k=5)
    gq, gs = quantize_embeddings_int8(jnp.asarray(g))
    s_q, i_q = cosine_topk_int8(jnp.asarray(q), gq, gs, k=5)

    np.testing.assert_array_equal(
        np.asarray(i_q[:, 0]), np.asarray(i_ref[:, 0])
    )
    np.testing.assert_allclose(
        np.asarray(s_q), np.asarray(s_ref), atol=2e-2
    )


def test_auto_cosine_topk_kernel_selection(rng, monkeypatch):
    """Kernel choice follows the gallery array's platform, not the process
    default backend, and can be forced explicitly."""
    import jax.numpy as jnp

    from facerecognition_tpu.ops import matcher

    q = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))

    # explicit dense always works
    s, idx = matcher.auto_cosine_topk(q, g, 3, kernel="dense")
    assert s.shape == (4, 3)

    with pytest.raises(ValueError, match="unknown kernel"):
        matcher.auto_cosine_topk(q, g, 3, kernel="fast")

    # auto on cpu-resident arrays: never routes to pallas even when the
    # score matrix is "huge" per the threshold
    monkeypatch.setattr(matcher, "DENSE_SCORES_MAX_BYTES", 0)
    called = {}

    def fake_pallas(q, g, k):
        called["pallas"] = True
        return matcher.cosine_topk(q, g, k)

    import facerecognition_tpu.ops.pallas_topk as pt

    monkeypatch.setattr(pt, "pallas_cosine_topk", fake_pallas)
    matcher.auto_cosine_topk(q, g, 3)
    assert "pallas" not in called  # cpu arrays -> dense

    # tpu-resident arrays above the threshold -> pallas
    class FakeDev:
        platform = "tpu"

    monkeypatch.setattr(matcher, "_array_platform", lambda x: "tpu")
    matcher.auto_cosine_topk(q, g, 3)
    assert called.get("pallas")


def test_n_valid_masks_capacity_padding(rng):
    """Padding rows (zeros — cosine 0) must never beat real NEGATIVE
    matches when n_valid masks them (the capacity-padded store contract)."""
    import jax.numpy as jnp

    from facerecognition_tpu.ops.matcher import cosine_topk

    q = rng.normal(size=(3, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    real = -q[:, :]  # 3 rows, each exactly anti-correlated with a query
    padded = np.zeros((8, 16), np.float32)
    padded[:3] = real
    scores, idx = cosine_topk(
        jnp.asarray(q), jnp.asarray(padded), 2, True, np.int32(3)
    )
    idx = np.asarray(idx)
    assert (idx < 3).all(), f"padding row returned: {idx}"
    # best match for query i is a real row with cosine <= some negative val
    assert np.asarray(scores).max() < 0.5


def test_n_valid_masks_int8_padding(rng):
    import jax.numpy as jnp

    from facerecognition_tpu.ops.matcher import (
        cosine_topk_int8,
        quantize_embeddings_int8_np,
    )

    q = rng.normal(size=(2, 16)).astype(np.float32)
    padded = np.zeros((8, 16), np.float32)
    padded[:2] = -q / np.linalg.norm(q, axis=1, keepdims=True)
    gq, gs = quantize_embeddings_int8_np(padded)
    _, idx = cosine_topk_int8(
        jnp.asarray(q), jnp.asarray(gq), jnp.asarray(gs), 2, np.int32(2)
    )
    assert (np.asarray(idx) < 2).all()


def test_auto_rejects_pallas_with_mask(rng):
    import jax.numpy as jnp

    from facerecognition_tpu.ops.matcher import auto_cosine_topk

    q = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    with pytest.raises(ValueError, match="n_valid"):
        auto_cosine_topk(q, g, 2, kernel="pallas", n_valid=np.int32(3))
