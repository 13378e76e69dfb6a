"""XLA-native NMS over fixed-size padded candidate buffers.

Dynamic candidate counts are XLA-hostile (SURVEY.md §7 hard part #2): this
NMS takes a FIXED K candidates (padded with score 0) and emits a FIXED
``max_out`` selection with a validity mask — shapes never depend on data, so
the detector pipeline stays one compiled graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def iou_matrix(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise IoU for [x1, y1, x2, y2] boxes: (A, 4) x (B, 4) → (A, B)."""
    a = boxes_a[:, None, :]
    b = boxes_b[None, :, :]
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0.0) * jnp.maximum(
        a[..., 3] - a[..., 1], 0.0
    )
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0.0) * jnp.maximum(
        b[..., 3] - b[..., 1], 0.0
    )
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-9)


@partial(jax.jit, static_argnums=(3,))
def nms_padded(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.3,
    max_out: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Greedy NMS on a padded candidate set.

    Args:
      boxes: (K, 4) [x1, y1, x2, y2].
      scores: (K,) confidence; padding rows must have score <= 0.
      iou_threshold: suppression threshold (traced value ok).
      max_out: static output count.

    Returns:
      (indices, valid): (max_out,) int32 indices into the K candidates and a
      bool mask (False = fewer than max_out survivors).
    """
    k = boxes.shape[0]
    iou = iou_matrix(boxes, boxes)  # (K, K)

    def body(step, carry):
        alive_scores, out_idx, out_valid = carry
        best = jnp.argmax(alive_scores)
        best_score = alive_scores[best]
        keep = best_score > 0.0
        out_idx = out_idx.at[step].set(jnp.where(keep, best, -1))
        out_valid = out_valid.at[step].set(keep)
        # Suppress the pick and everything overlapping it.
        suppress = (iou[best] >= iou_threshold) | (
            jnp.arange(k) == best
        )
        alive_scores = jnp.where(
            keep & suppress, -jnp.inf, alive_scores
        )
        return alive_scores, out_idx, out_valid

    init = (
        jnp.where(scores > 0, scores, -jnp.inf),
        jnp.full((max_out,), -1, jnp.int32),
        jnp.zeros((max_out,), bool),
    )
    _, out_idx, out_valid = jax.lax.fori_loop(0, max_out, body, init)
    return out_idx, out_valid
