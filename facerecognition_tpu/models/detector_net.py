"""Single-stage face detector (BlazeFace-style) — anchors, decode, NMS in XLA.

TPU-native replacement for the reference's MTCNN cascade
(preprocessing/face_detector.py:81-97, facenet-pytorch P/R/O-net pyramid):
image pyramids and dynamic candidate lists don't compile; instead a fixed
anchor grid over two feature maps regresses box + 5 landmarks in one forward
(BlazeFace, arXiv:1907.05047 — see PAPERS.md), followed by padded-buffer NMS
(`ops.nms`). The whole detect path is ONE jitted graph per input size.

Anchor layout (128x128 input): 16x16 map x2 anchors + 8x8 map x6 anchors
= 896 anchors. Each anchor predicts [logit, dcx, dcy, w, h, 5x(lx, ly)]
in input-pixel units relative to the anchor center.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from facerecognition_tpu.ops.nms import nms_padded

Dtype = Any


class BlazeBlock(nn.Module):
    """Depthwise 5x5 + pointwise 1x1 with residual (stride 1 or 2)."""

    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        y = nn.Conv(
            cin,
            (5, 5),
            strides=(self.strides, self.strides),
            padding=((2, 2), (2, 2)),
            feature_group_count=cin,
            dtype=self.dtype,
            name="dw",
        )(x)
        y = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="pw")(y)
        if self.strides == 2:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if cin != self.features:
            x = jnp.pad(
                x, ((0, 0), (0, 0), (0, 0), (0, self.features - cin))
            )
        return nn.relu(x + y)


class BlazeFaceNet(nn.Module):
    """Backbone + dual-scale detection heads.

    Input: (B, S, S, 3) normalized float, S divisible by 16.
    Output: (B, A, 15) raw predictions, A = (S/8)² * 2 + (S/16)² * 6.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(
            24, (5, 5), strides=(2, 2), padding=((2, 2), (2, 2)),
            dtype=self.dtype, name="stem",
        )(x)
        x = nn.relu(x)
        x = BlazeBlock(24, dtype=self.dtype, name="b1")(x)
        x = BlazeBlock(28, dtype=self.dtype, name="b2")(x)
        x = BlazeBlock(32, 2, dtype=self.dtype, name="b3")(x)  # S/4
        x = BlazeBlock(36, dtype=self.dtype, name="b4")(x)
        x = BlazeBlock(42, dtype=self.dtype, name="b5")(x)
        x = BlazeBlock(48, 2, dtype=self.dtype, name="b6")(x)  # S/8
        x = BlazeBlock(56, dtype=self.dtype, name="b7")(x)
        x = BlazeBlock(64, dtype=self.dtype, name="b8")(x)
        f1 = x  # (S/8, S/8, 64) — small faces
        x = BlazeBlock(88, 2, dtype=self.dtype, name="b9")(x)  # S/16
        x = BlazeBlock(96, dtype=self.dtype, name="b10")(x)
        x = BlazeBlock(96, dtype=self.dtype, name="b11")(x)
        f2 = x  # (S/16, S/16, 96) — large faces

        h1 = nn.Conv(2 * 15, (1, 1), dtype=self.dtype, name="head1")(f1)
        h2 = nn.Conv(6 * 15, (1, 1), dtype=self.dtype, name="head2")(f2)
        b = x.shape[0]
        out1 = h1.reshape(b, -1, 15)
        out2 = h2.reshape(b, -1, 15)
        return jnp.concatenate([out1, out2], axis=1).astype(jnp.float32)


class DenseDetNet(nn.Module):
    """MXU-dense detector backbone (v3): plain 3x3/5x5 convolutions.

    BlazeFaceNet's depthwise 5x5 blocks run on the VPU (no MXU use) —
    measured 3.2 ms/256@128² vs 2.4 ms for this dense stack, despite ~4x
    the FLOPs (scripts/profile_pipeline.py; same finding as MobileFaceNet
    vs ResNet50 in CLAUDE.md). Same input/output contract as BlazeFaceNet:
    (B, S, S, 3) normalized → (B, A, 15), A = (S/8)²·2 + (S/16)²·6, so
    anchors/decode/NMS and the training loss are shared.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        relu = nn.relu
        x = relu(
            nn.Conv(
                32, (5, 5), strides=(2, 2), padding=((2, 2), (2, 2)),
                dtype=self.dtype, name="stem",
            )(x)
        )  # S/2
        x = relu(nn.Conv(48, (3, 3), dtype=self.dtype, name="c1")(x))
        x = relu(
            nn.Conv(64, (3, 3), strides=(2, 2), dtype=self.dtype, name="d1")(x)
        )  # S/4
        x = relu(nn.Conv(64, (3, 3), dtype=self.dtype, name="c2")(x))
        x = relu(
            nn.Conv(96, (3, 3), strides=(2, 2), dtype=self.dtype, name="d2")(x)
        )  # S/8
        x = relu(nn.Conv(96, (3, 3), dtype=self.dtype, name="c3")(x))
        f1 = relu(nn.Conv(96, (3, 3), dtype=self.dtype, name="c4")(x))
        x = relu(
            nn.Conv(128, (3, 3), strides=(2, 2), dtype=self.dtype, name="d3")(
                f1
            )
        )  # S/16
        f2 = relu(nn.Conv(128, (3, 3), dtype=self.dtype, name="c5")(x))
        h1 = nn.Conv(2 * 15, (1, 1), dtype=self.dtype, name="head1")(f1)
        h2 = nn.Conv(6 * 15, (1, 1), dtype=self.dtype, name="head2")(f2)
        b = x.shape[0]
        out1 = h1.reshape(b, -1, 15)
        out2 = h2.reshape(b, -1, 15)
        return jnp.concatenate([out1, out2], axis=1).astype(jnp.float32)


DETECTOR_ARCHS = {"blaze": BlazeFaceNet, "dense": DenseDetNet}


def build_detector_net(arch: str = "blaze", dtype: Dtype = jnp.float32):
    """Detector backbone by arch name (checkpoints carry an 'arch' key)."""
    try:
        return DETECTOR_ARCHS[arch](dtype=dtype)
    except KeyError:
        raise ValueError(
            f"unknown detector arch {arch!r}; have {sorted(DETECTOR_ARCHS)}"
        ) from None


def anchor_centers(input_size: int) -> np.ndarray:
    """(A, 2) anchor centers in pixels + (A,) anchor scale (base size)."""
    out = []
    for grid, n_anchor, base in (
        (input_size // 8, 2, input_size / 8),
        (input_size // 16, 6, input_size / 4),
    ):
        step = input_size / grid
        ys, xs = np.mgrid[0:grid, 0:grid]
        cx = (xs + 0.5) * step
        cy = (ys + 0.5) * step
        c = np.stack([cx, cy], -1).reshape(-1, 2)
        c = np.repeat(c, n_anchor, axis=0)
        s = np.full((len(c), 1), base, np.float32)
        out.append(np.concatenate([c, s], -1))
    return np.concatenate(out).astype(np.float32)  # (A, 3): cx, cy, base


@jax.jit
def decode_predictions(
    raw: jax.Array, anchors: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Raw head output → (scores, boxes, landmarks) in input pixels.

    raw: (A, 15); anchors: (A, 3) [cx, cy, base] (already in pixels — the
    decode needs no input_size).
    Returns scores (A,), boxes (A, 4) xyxy, landmarks (A, 5, 2).
    """
    scores = jax.nn.sigmoid(raw[:, 0])
    cx = anchors[:, 0] + raw[:, 1] * anchors[:, 2] * 0.5
    cy = anchors[:, 1] + raw[:, 2] * anchors[:, 2] * 0.5
    w = jnp.exp(jnp.clip(raw[:, 3], -4.0, 4.0)) * anchors[:, 2]
    h = jnp.exp(jnp.clip(raw[:, 4], -4.0, 4.0)) * anchors[:, 2]
    boxes = jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )
    lm = raw[:, 5:15].reshape(-1, 5, 2) * anchors[:, None, 2:3] * 0.5
    landmarks = lm + jnp.stack([anchors[:, 0], anchors[:, 1]], -1)[:, None, :]
    return scores, boxes, landmarks


@partial(jax.jit, static_argnums=(3,))
def detect_faces(
    raw: jax.Array,
    anchors: jax.Array,
    iou_threshold: float,
    max_faces: int = 16,
):
    """Full post-process for ONE image: decode → top-K prefilter → NMS.

    Returns (boxes (max_faces, 4), landmarks (max_faces, 5, 2),
    scores (max_faces,), valid (max_faces,)) — fixed shapes.
    """
    scores, boxes, landmarks = decode_predictions(raw, anchors)
    # Prefilter size scales with the requested face count: top_k over all
    # anchors is the stage's dominant cost (vmapped over the batch), and
    # 8 candidates per output slot is ample headroom for greedy NMS at
    # IoU>=0.3 (k=64 measures ~20% faster than the old fixed k=256 at
    # max_faces=4, scripts/profile_pipeline.py).
    k = min(scores.shape[0], max(64, 8 * max_faces))
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]
    top_lm = landmarks[top_idx]
    keep_idx, valid = nms_padded(top_boxes, top_scores, iou_threshold, max_faces)
    safe = jnp.maximum(keep_idx, 0)
    return (
        top_boxes[safe],
        top_lm[safe],
        jnp.where(valid, top_scores[safe], 0.0),
        valid,
    )


detect_faces_batch = jax.vmap(
    detect_faces, in_axes=(0, None, None, None)
)


def detect_best_face(raw: jax.Array, anchors: jax.Array):
    """Single best face for ONE image: argmax + one-anchor decode.

    The one-face-per-frame serving contract (engine ``recognize()``, the
    fused bench graph) consumes only the top detection, and greedy NMS's
    FIRST pick is by construction the score argmax — so for that contract
    this is exactly ``detect_faces(..., max_faces=1)``'s top slot without
    the all-anchor top-k prefilter or the NMS loop (the post-process
    stage's dominant costs, scripts/profile_pipeline.py).

    Returns (box (4,) xyxy, landmarks (5, 2), score ()).
    """
    i = jnp.argmax(raw[:, 0])  # sigmoid is monotonic: argmax on the logit
    r = raw[i]
    a = anchors[i]
    score = jax.nn.sigmoid(r[0])
    cx = a[0] + r[1] * a[2] * 0.5
    cy = a[1] + r[2] * a[2] * 0.5
    w = jnp.exp(jnp.clip(r[3], -4.0, 4.0)) * a[2]
    h = jnp.exp(jnp.clip(r[4], -4.0, 4.0)) * a[2]
    box = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    lm = r[5:15].reshape(5, 2) * a[2] * 0.5 + jnp.stack([a[0], a[1]])
    return box, lm, score


detect_best_face_batch = jax.vmap(detect_best_face, in_axes=(0, None))
