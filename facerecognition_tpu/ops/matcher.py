"""Gallery matching: cosine similarity as one matmul + top-k.

TPU-native replacement for BOTH of the reference's match paths:
- the python for-loop cosine scan over the gallery dict
  (reference inference/recognition_engine.py:267-289), and
- FAISS ``IndexFlatIP`` (reference inference/extract_embeddings.py:595-645,
  recognition_engine.py:291-326) — exact inner-product search over a
  normalized gallery is just a matmul + ``lax.top_k`` on the MXU.

Gallery layout: a device-resident (N, D) float32/bfloat16 matrix of
L2-normalized embeddings plus a host-side list of names. For galleries too
big for one chip, see `facerecognition_tpu.parallel.sharding.sharded_topk`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along ``axis`` (the F.normalize contract the reference
    applies to every embedding, extract_embeddings.py:374-384)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def cosine_similarity(a, b) -> float:
    """Scalar cosine similarity between two vectors (host convenience API).

    Mirrors the reference's public ``cosine_similarity`` helper
    (inference/recognition_engine.py:41-63) including the zero-vector guard.
    """
    a = np.asarray(a, dtype=np.float32).reshape(-1)
    b = np.asarray(b, dtype=np.float32).reshape(-1)
    na = np.linalg.norm(a)
    nb = np.linalg.norm(b)
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def _topk_lastdim(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over the last dim, blocked for large N.

    ``lax.top_k`` over a (B, N) row costs O(N·sort-ish) per row; for the
    gallery regime (N ≥ 4096, k ≤ 32) a two-level reduction is cheaper on
    TPU: top-k inside each 1024-wide block (cheap small sorts), then top-k
    over the nb·k survivors. Exact, including ``lax.top_k``'s
    lowest-index tie-breaking: candidates are ordered (block, rank), so
    equal values resolve to the lower global index at both levels.
    """
    b, n = scores.shape
    block = 1024
    if n < 4 * block or k > 32:
        return jax.lax.top_k(scores, k)
    pad = (-n) % block
    if pad:
        scores = jnp.pad(
            scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
        )
    nb = scores.shape[1] // block
    sv, si = jax.lax.top_k(scores.reshape(b, nb, block), k)  # (B, nb, k)
    cand = sv.reshape(b, nb * k)
    cidx = (si + (jnp.arange(nb) * block)[None, :, None]).reshape(b, nb * k)
    v, i = jax.lax.top_k(cand, k)
    return v, jnp.take_along_axis(cidx, i, axis=1)


@partial(jax.jit, static_argnums=(2, 3))
def cosine_topk(
    queries: jax.Array,
    gallery: jax.Array,
    k: int = 5,
    normalized: bool = False,
    n_valid=None,
) -> tuple[jax.Array, jax.Array]:
    """Top-k cosine matches of each query against the gallery.

    Args:
      queries: (B, D) embeddings — normalized internally unless
        ``normalized``.
      gallery: (N, D) embeddings — normalized internally unless
        ``normalized``.
      k: number of neighbours (clipped to N by the caller).
      normalized: both inputs are already unit-norm (the Gallery stores
        normalized rows; embedders emit normalized queries). Skips two
        normalization passes — at 10k ids the per-call gallery normalize is
        ~0.9 ms/batch, half the match stage (scripts/profile_pipeline.py),
        because XLA does not hoist it out of serving scan loops.
      n_valid: optional DYNAMIC count of live gallery rows. Rows >= n_valid
        (capacity padding) are masked to -inf so they can never win — even
        over negative matches — and changing n_valid never recompiles
        (Gallery.device_store serves a capacity-padded matrix so that
        enrollment growth keeps the compiled graph; callers must ensure
        ``k <= n_valid``).

    Returns:
      (scores, indices): both (B, k); scores are cosine similarities sorted
      descending. One matmul on the MXU + ``lax.top_k``.
    """
    q = queries.astype(jnp.float32)
    g = gallery.astype(jnp.float32)
    if not normalized:
        q = l2_normalize(q)
        g = l2_normalize(g)
    scores = jnp.dot(
        q, g.T, preferred_element_type=jnp.float32
    )  # (B, N) — MXU
    if n_valid is not None:
        scores = jnp.where(
            jnp.arange(scores.shape[1])[None, :] < n_valid,
            scores,
            -jnp.inf,
        )
    return _topk_lastdim(scores, k)


# Gallery size above which the Pallas fused matmul+top-k kernel wins (it
# avoids materializing the (B, N) score matrix in HBM). Only on TPU.
# When the dense path's transient (B, N) score matrix would exceed this
# many bytes in HBM, switch to the Pallas streaming kernel (scores never
# leave VMEM). Measured on one v5e chip at N=1M, B=256 (bench_gallery.py):
# dense 18.1k q/s vs pallas 12.3k q/s with exact top-1 agreement — dense
# WINS on speed until memory pressure, so the streaming kernel is the
# capacity path (e.g. B=512 × N=4M → 8 GB scores would not fit next to a
# multi-GB gallery), not the default.
DENSE_SCORES_MAX_BYTES = 2 << 30  # 2 GiB


def _array_platform(x) -> str:
    """Platform of the device ``x`` actually lives on.

    The kernel choice must follow the array, not the process default
    backend — a CPU-pinned process can still hold TPU-resident arrays (and
    vice versa). numpy inputs fall back to the default backend they will be
    transferred to.
    """
    devices = getattr(x, "devices", None)
    if callable(devices):
        try:
            return next(iter(devices())).platform
        except Exception:
            pass
    return jax.devices()[0].platform


def auto_cosine_topk(
    queries: jax.Array,
    gallery: jax.Array,
    k: int = 5,
    kernel: str = "auto",
    normalized: bool = False,
    n_valid=None,
) -> tuple[jax.Array, jax.Array]:
    """cosine_topk that switches to the Pallas streaming kernel when the
    dense score matrix would pressure HBM (see ops/pallas_topk.py).

    ``kernel``: ``'auto'`` (memory-based switch, TPU-resident arrays only),
    ``'dense'``, or ``'pallas'`` to force a path explicitly.

    ``n_valid`` (capacity-padding mask, see :func:`cosine_topk`) is a
    dense-path feature: the streaming kernel has no mask support, so
    ``'auto'`` with a mask stays dense and an explicit ``'pallas'`` with a
    mask is rejected.
    """
    if kernel not in ("auto", "dense", "pallas"):
        raise ValueError(f"unknown kernel {kernel!r}")
    if kernel == "auto":
        scores_bytes = queries.shape[0] * gallery.shape[0] * 4
        on_tpu = _array_platform(gallery) not in ("cpu",)
        kernel = (
            "pallas"
            if n_valid is None
            and on_tpu
            and scores_bytes > DENSE_SCORES_MAX_BYTES
            else "dense"
        )
    if kernel == "pallas":
        if n_valid is not None:
            raise ValueError(
                "n_valid masking is not supported by the pallas kernel; "
                "pass the exact-size gallery instead"
            )
        from facerecognition_tpu.ops.pallas_topk import pallas_cosine_topk

        return pallas_cosine_topk(queries, gallery, k)
    return cosine_topk(queries, gallery, k, normalized, n_valid)


def quantize_embeddings_int8(x) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization of an embedding matrix.

    Returns ``(q, scale)`` with ``q`` int8 of x's shape and ``scale`` (N,)
    float32 such that ``x ≈ q * (scale / 127)`` row-wise. Zero rows get
    scale 0 (and all-zero codes), so dequantized scores stay 0.

    Capacity path for very large galleries: 4x less HBM than f32 rows, and
    the int8×int8 score matmul accumulates in int32 on the MXU. For
    L2-normalized 512-d embeddings the per-row max-abs is ~0.1-0.2, so the
    quantization step is ~1e-3 — cosine scores move by O(1e-3), far below
    the ~0.1 match margins (tests/test_matcher.py pins top-1 agreement).
    """
    x = jnp.asarray(x, jnp.float32)
    scale = jnp.max(jnp.abs(x), axis=-1)
    safe = jnp.maximum(scale, 1e-12)[:, None]
    q = jnp.round(x / safe * 127.0).astype(jnp.int8)
    return q, scale


def quantize_embeddings_int8_np(
    x: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side (numpy) twin of :func:`quantize_embeddings_int8`.

    Galleries quantize on host and ship only the codes — a 4x smaller
    host->device transfer, and on the axon backend every transferred byte
    leaks host RSS (CLAUDE.md). The single source of the quantization
    convention for both the single-chip Gallery and ShardedGallery.
    """
    x = np.asarray(x, np.float32)
    scale = np.max(np.abs(x), axis=-1)
    safe = np.maximum(scale, 1e-12)[:, None]
    q = np.round(x / safe * 127.0).astype(np.int8)
    return q, scale.astype(np.float32)


@partial(jax.jit, static_argnums=(3,))
def cosine_topk_int8(
    queries: jax.Array,
    gallery_q: jax.Array,
    gallery_scale: jax.Array,
    k: int = 5,
    n_valid=None,
) -> tuple[jax.Array, jax.Array]:
    """Top-k cosine matches against an int8-quantized gallery.

    Args:
      queries: (B, D) float32 embeddings (normalized or not — quantization
        is scale-invariant per row, and the gallery rows were normalized
        before quantization, so scores are cosine up to O(1e-3) error).
      gallery_q: (N, D) int8 codes from :func:`quantize_embeddings_int8`.
      gallery_scale: (N,) float32 per-row scales.
      k: neighbour count.

    Returns:
      (scores, indices), both (B, k), scores descending — same contract as
      :func:`cosine_topk`. The (B, N) int32 score matrix rides the MXU at
      int8 input width; dequantization is one rank-1 rescale fused into
      the matmul's epilogue by XLA.
    """
    q = l2_normalize(queries.astype(jnp.float32))
    qq, q_scale = quantize_embeddings_int8(q)
    acc = jax.lax.dot_general(
        qq,
        gallery_q,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, N) int32
    scores = (
        acc.astype(jnp.float32)
        * (q_scale[:, None] / 127.0)
        * (gallery_scale[None, :] / 127.0)
    )
    if n_valid is not None:  # capacity-padding mask (see cosine_topk)
        scores = jnp.where(
            jnp.arange(scores.shape[1])[None, :] < n_valid,
            scores,
            -jnp.inf,
        )
    return _topk_lastdim(scores, k)


@partial(jax.jit, static_argnums=(2,))
def compute_prototypes(
    embeddings: jax.Array, labels: jax.Array, num_classes: int
) -> jax.Array:
    """Per-class mean embedding, L2-normalized ("prototypes").

    Replaces the reference's per-class numpy loop
    (inference/extract_embeddings.py:555-592) with one segment-sum.

    Args:
      embeddings: (N, D).
      labels: (N,) int class ids in [0, num_classes).
      num_classes: static class count.

    Returns:
      (num_classes, D) normalized prototypes (zero rows for empty classes).
    """
    emb = embeddings.astype(jnp.float32)
    sums = jax.ops.segment_sum(emb, labels, num_segments=num_classes)
    counts = jax.ops.segment_sum(
        jnp.ones((emb.shape[0],), jnp.float32), labels, num_segments=num_classes
    )
    means = sums / jnp.maximum(counts[:, None], 1.0)
    norms = jnp.sqrt(jnp.sum(means * means, axis=-1, keepdims=True))
    return jnp.where(norms > 1e-12, means / jnp.maximum(norms, 1e-12), means)


@jax.jit
def pairwise_sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distance matrix via the matmul identity.

    ||a-b||² = ||a||² + ||b||² - 2ab — one MXU matmul, used by the FaceNet
    triplet miners (replaces torch.cdist in facenet_dataloader.py:169-284).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    d2 = a2 + b2.T - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(d2, 0.0)
