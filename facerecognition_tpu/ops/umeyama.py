"""Closed-form Umeyama similarity transform, jittable and batchable.

TPU-native replacement for skimage ``SimilarityTransform.estimate`` as used by
the reference for 5-point face alignment (reference
inference/recognition_engine.py:195-197, preprocessing/celeba_preprocessing.py:442).

The 5-point ArcFace destination template (112x112 canonical face) is the same
constant the reference defines in inference/recognition_engine.py:32-38.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Canonical 112x112 ArcFace landmark template:
# left eye, right eye, nose, left mouth corner, right mouth corner.
ARCFACE_TEMPLATE = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    dtype=np.float32,
)


def umeyama(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Least-squares similarity transform mapping ``src`` points onto ``dst``.

    Closed-form Umeyama (1991) solution via a 2x2 SVD — tiny, jittable, and
    batchable with ``vmap``. Returns a (2, 3) affine matrix ``M`` such that
    ``dst ≈ src @ M[:, :2].T + M[:, 2]``.

    Args:
      src: (N, 2) source landmarks (e.g. detected 5-point landmarks).
      dst: (N, 2) destination landmarks (e.g. ``ARCFACE_TEMPLATE``).

    Returns:
      (2, 3) float32 affine matrix (rotation*scale | translation).
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    n = src.shape[0]

    mu_src = jnp.mean(src, axis=0)
    mu_dst = jnp.mean(dst, axis=0)
    src_c = src - mu_src
    dst_c = dst - mu_dst

    # Covariance of the point sets (2x2). HIGHEST precision: this is a tiny
    # solver whose output feeds pixel-coordinate warps — bf16 MXU default
    # would shift landmarks by ~0.5px.
    cov = (
        jnp.dot(dst_c.T, src_c, precision=jax.lax.Precision.HIGHEST) / n
    )

    u, s, vt = jnp.linalg.svd(cov)

    # Reflection guard: force det(R) = +1.
    d_sign = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    d = jnp.array([1.0, 0.0]) + jnp.array([0.0, 1.0]) * d_sign  # [1, ±1]
    rot = jnp.dot(u * d[None, :], vt, precision=jax.lax.Precision.HIGHEST)

    var_src = jnp.mean(jnp.sum(src_c * src_c, axis=1))
    scale = jnp.sum(s * d) / jnp.maximum(var_src, 1e-12)

    a = scale * rot
    t = mu_dst - jnp.dot(a, mu_src, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([a, t[:, None]], axis=1)


def invert_affine(m: jax.Array) -> jax.Array:
    """Invert a (2, 3) affine matrix. Returns the (2, 3) inverse.

    Used to convert a forward (src→dst) warp matrix into the inverse map
    that the bilinear gather in :func:`facerecognition_tpu.ops.image.affine_warp`
    consumes (same convention as ``cv2.warpAffine`` without WARP_INVERSE_MAP).
    """
    a = m[:, :2]
    t = m[:, 2]
    # Singularity guard: degenerate landmark sets (all points coincident)
    # produce a ~zero linear part; fall back to identity instead of NaNs so
    # the jitted pipeline stays finite (caller-level confidence filtering
    # rejects such detections anyway).
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    ok = jnp.abs(det) > 1e-8
    a_safe = jnp.where(ok, a, jnp.eye(2, dtype=a.dtype))
    a_inv = jnp.linalg.inv(a_safe)
    t_inv = -jnp.dot(a_inv, t, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([a_inv, t_inv[:, None]], axis=1)


# Batched variants.
umeyama_batch = jax.vmap(umeyama, in_axes=(0, None))
