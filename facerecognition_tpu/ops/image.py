"""Jitted image ops: affine warp, resize, crop, color convert, normalize.

TPU-native replacements for the reference's OpenCV C++ image calls
(``cv2.warpAffine`` in inference/recognition_engine.py:199, ``cv2.resize`` in
preprocessing/face_detector.py:405, ``cv2.cvtColor``). Everything here is a
pure function over fixed-shape arrays so it fuses into the surrounding jit.

Layout convention: images are HWC (or NHWC batched) float32/uint8, channel
last — the natural TPU layout (lane dimension = channels*width tiling).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from facerecognition_tpu.ops.umeyama import ARCFACE_TEMPLATE, invert_affine, umeyama


@partial(jax.jit, static_argnums=(1, 2))
def bilinear_resize(image: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with half-pixel centers (cv2.INTER_LINEAR convention).

    Replacement for ``cv2.resize`` (reference preprocessing/face_detector.py:405).
    Direct bilinear sampling with NO antialiasing on downscale, matching
    OpenCV (``jax.image.resize`` would antialias). Works on HW / HWC / NHWC
    input; output dtype float32.
    """
    img = image.astype(jnp.float32)
    if img.ndim == 4:
        return jax.vmap(lambda im: bilinear_resize(im, out_h, out_w))(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w = img.shape[0], img.shape[1]
    sy = h / out_h
    sx = w / out_w
    ys = (jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0) + 0.5) * sy - 0.5
    xs = (jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1) + 0.5) * sx - 0.5
    out = _gather_bilinear(img, xs, ys, mode="edge")
    return out[..., 0] if squeeze else out


def _gather_bilinear(
    img: jax.Array, xs: jax.Array, ys: jax.Array, mode: str = "constant"
) -> jax.Array:
    """Sample ``img`` (H, W, C) at float coords with bilinear interpolation.

    ``xs``/``ys`` are (out_h, out_w) float32 source coordinates. ``mode`` is
    the border convention: "constant" (zero, cv2.BORDER_CONSTANT) or "edge"
    (clamp, cv2.BORDER_REPLICATE — what cv2.resize uses at image edges).
    """
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        vals = img[yi_c, xi_c]  # advanced-index gather, (out_h, out_w, C)
        if mode == "edge":
            return vals
        valid = (
            (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        )[..., None]
        return jnp.where(valid, vals, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


@partial(jax.jit, static_argnums=(2, 3))
def affine_warp(
    image: jax.Array, m: jax.Array, out_h: int, out_w: int
) -> jax.Array:
    """Warp ``image`` (H, W, C) by forward affine ``m`` (2, 3) into (out_h, out_w, C).

    Same convention as ``cv2.warpAffine(img, M, (w, h))`` with INTER_LINEAR and
    constant zero border: output pixel (x, y) samples input at ``M^{-1}(x, y)``.
    (reference inference/recognition_engine.py:199 uses exactly this to align
    faces onto the 112x112 ArcFace template.)
    """
    img = image.astype(jnp.float32)
    minv = invert_affine(m.astype(jnp.float32))
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    src_x = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
    src_y = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
    return _gather_bilinear(img, src_x, src_y)


@partial(jax.jit, static_argnums=(2,))
def align_crop(
    image: jax.Array, landmarks: jax.Array, out_size: int = 112
) -> jax.Array:
    """Detect-time face alignment: 5-point Umeyama solve + warp to template.

    Fuses the reference's skimage ``SimilarityTransform.estimate`` +
    ``cv2.warpAffine`` pair (inference/recognition_engine.py:169-204) into one
    jitted op. ``landmarks`` is (5, 2) in (x, y) pixel coords.
    """
    template = jnp.asarray(ARCFACE_TEMPLATE) * (out_size / 112.0)
    m = umeyama(landmarks, template)
    return affine_warp(image, m, out_size, out_size)


# Batched alignment: (N, H, W, C) images + (N, 5, 2) landmarks → (N, S, S, C).
align_crop_batch = jax.vmap(align_crop, in_axes=(0, 0, None))


def crop_with_margin(
    image: jax.Array,
    bbox: jax.Array,
    margin: float = 0.2,
    target_size: int = 112,
) -> jax.Array:
    """Crop a face bbox with relative margin and resize to a square.

    Fallback path matching reference ``FaceDetector.crop_face``
    (preprocessing/face_detector.py:367-407): margin is a fraction of the bbox
    side added on each border; out-of-image area is zero-padded. Implemented
    as an affine warp so the output shape stays static under jit.

    ``bbox`` is (4,) [x1, y1, x2, y2] float.
    """
    x1, y1, x2, y2 = bbox[0], bbox[1], bbox[2], bbox[3]
    bw = x2 - x1
    bh = y2 - y1
    mx = bw * margin
    my = bh * margin
    cx1 = x1 - mx
    cy1 = y1 - my
    cw = bw + 2.0 * mx
    ch = bh + 2.0 * my
    # Forward map: crop box → [0, target)², with cv2.resize's half-pixel
    # sample centers (src = cx1 + (out+0.5)·cw/target − 0.5); a corner-
    # anchored map would shift every sample 0.5·(1/s−1) source pixels off
    # the reference crop_face = slice + cv2.resize result.
    sx = target_size / jnp.maximum(cw, 1e-6)
    sy = target_size / jnp.maximum(ch, 1e-6)
    m = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=jnp.float32
    ) * jnp.stack([sx, sy])[:, None]
    m = m.at[0, 2].set(-cx1 * sx + 0.5 * sx - 0.5)
    m = m.at[1, 2].set(-cy1 * sy + 0.5 * sy - 0.5)
    return affine_warp(image, m, target_size, target_size)


def rgb_to_grayscale(image: jax.Array) -> jax.Array:
    """ITU-R BT.601 luma, identical weights to ``cv2.cvtColor(..., COLOR_RGB2GRAY)``."""
    img = image.astype(jnp.float32)
    w = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)
    return img @ w


def normalize_imagenet_style(
    image: jax.Array, mean: float = 0.5, std: float = 0.5
) -> jax.Array:
    """uint8/float HWC image in [0,255] → normalized float in [-1, 1].

    The reference normalizes with Normalize(mean=[0.5]*3, std=[0.5]*3) after
    ToTensor (inference/extract_embeddings.py:170-185); this is the fused
    equivalent: x/255 → (x - mean)/std.
    """
    x = image.astype(jnp.float32) / 255.0
    return (x - mean) / std
