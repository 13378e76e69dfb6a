"""MXU-native affine warp: two-pass separable resampling as batched matmuls.

The direct bilinear warp (`ops.image.affine_warp`) is a per-pixel gather —
TPUs have no vector-gather unit, so XLA lowers it to ~1.9k img/s for
256x(160→112) warps (measured). This module reformulates the warp as the
classic two-pass decomposition (Catmull & Smith 1980): a vertical 1D
resample followed by a horizontal 1D resample, each expressed as a dense
interpolation-matrix product that runs on the MXU at >100x the gather's
throughput.

Derivation: output pixel (i, j) samples the source at
``x_s = m00 j + m01 i + m02``, ``y_s = m10 j + m11 i + m12`` (inverse map).
Pass 1 resamples each source column x vertically at
``Y(i, x) = A i + B x + C`` with ``B = m10/m00``, ``A = m11 - B m01``,
``C = m12 - B m02``; pass 2 resamples horizontally at ``x_s(i, j)``.
Then ``Y(i, x_s) = y_s`` exactly, so the two passes land on the true source
point. The only approximation vs direct bilinear is a sub-pixel shear of the
y-interpolation window (|error| ≤ |tan rotation| of one tap position);
for face alignment (|rot| < 30°) the embedding-level effect is measured at
cosine > 0.999 vs the exact warp (see tests/test_warp_mxu.py).

Requires |m00| not tiny (rotation < 90° — always true for face alignment).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from facerecognition_tpu.ops.umeyama import (
    ARCFACE_TEMPLATE,
    invert_affine,
    umeyama_batch,
)


def _interp_weights(positions: jax.Array, n_src: int) -> jax.Array:
    """Linear-interpolation weight matrix rows: tri(pos - y), zero outside.

    positions: (..., P) sampling positions. Returns (..., P, n_src) weights
    with ≤2 nonzeros per row; rows sampling outside [0, n_src-1] get zero
    weight (constant-black border, matching cv2.BORDER_CONSTANT).
    """
    y = jax.lax.broadcasted_iota(
        jnp.float32, positions.shape + (n_src,), positions.ndim
    )
    d = jnp.abs(positions[..., None] - y)
    w = jnp.maximum(0.0, 1.0 - d)
    # Zero the border contribution for samples fully outside the image.
    inside = (positions >= -1.0 + 1e-6) & (positions <= n_src - 1e-6)
    return w * inside[..., None].astype(jnp.float32)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def affine_warp_mxu_batch(
    images: jax.Array,
    ms: jax.Array,
    out_h: int,
    out_w: int,
    chunk: int = 16,
    fast: bool | str = False,
) -> jax.Array:
    """Batched affine warp via two matmul passes.

    Args:
      images: (B, H, W, C) float32.
      ms: (B, 2, 3) forward affine matrices (same convention as
        ``cv2.warpAffine`` / ``ops.image.affine_warp``).
      out_h, out_w: output size.
      chunk: images per lax.map step (bounds the (chunk, W, out_h, H)
        weight-tensor working set; 16 → ~183 MB f32 / ~92 MB on the fast=True bf16 path for 160² sources).
      fast: precision of the einsum operands. False = f32 HIGHEST (golden
        pixel parity). True = bf16 operands, f32 accumulation: uint8 pixel
        values are exactly representable in bf16; only the interpolation
        weights quantize (2^-8 relative ≈ 0.4% → ≤1 intensity level),
        halving the dominant weight-tensor HBM traffic. "int8" = int8
        operands, int32 accumulation: weights quantize to 1/127 steps
        (≈0.4%, same magnitude as bf16) and the inter-pass image requantizes
        once (≤0.5 level), for ≤2 intensity levels total. MEASURED SLOWER
        on the current backend (15.8k vs 24.2k faces/s end-to-end,
        round 5): the batched 4-D int8 einsum does not reach the MXU int8
        fast path that the plain 2-D gallery matmul
        (ops.matcher.cosine_topk_int8) enjoys — kept as an exactness-
        characterized mode for backends where it does; bf16 (True) is the
        serving hot-path choice. Pixel requirement for "int8" is
        integer-valued uint8 content (exact for every decoded image;
        arbitrary float sources round to the nearest level).

    Returns:
      (B, out_h, out_w, C) float32.
    """
    b, h, w, c = images.shape
    images = images.astype(jnp.float32)

    def warp_chunk(args):
        imgs, m = args  # (k, H, W, C), (k, 2, 3)
        minv = jax.vmap(invert_affine)(m.astype(jnp.float32))  # (k, 2, 3)
        m00, m01, m02 = minv[:, 0, 0], minv[:, 0, 1], minv[:, 0, 2]
        m10, m11, m12 = minv[:, 1, 0], minv[:, 1, 1], minv[:, 1, 2]
        # Guard m00 ~ 0 (≥90° rotation unsupported; keep finite) —
        # sign-preserving, else a tiny NEGATIVE m00 would flip the shear
        # coefficient's sign instead of clamping its magnitude.
        m00_safe = jnp.where(
            jnp.abs(m00) < 1e-6, jnp.where(m00 < 0, -1e-6, 1e-6), m00
        )
        bb = m10 / m00_safe
        aa = m11 - bb * m01
        cc = m12 - bb * m02

        ii = jax.lax.broadcasted_iota(jnp.float32, (out_h, 1), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)
        jj = jax.lax.broadcasted_iota(jnp.float32, (1, out_w), 1)

        # Pass 1: vertical resample. Y (k, out_h, W) sampling positions.
        ypos = aa[:, None, None] * ii[None] + bb[:, None, None] * xx[None] + cc[:, None, None]
        wy = _interp_weights(
            ypos.transpose(0, 2, 1), h
        )  # (k, W, out_h, H)
        # Pass 2 sampling positions x_s(i, j) (k, out_h, out_w).
        xpos = (
            m00[:, None, None] * jj[None]
            + m01[:, None, None] * ii[None]
            + m02[:, None, None]
        )
        wx = _interp_weights(xpos, w)  # (k, out_h, out_w, W)

        if fast == "int8":
            # Integer path: weights at 1/127 steps, pixels centered into
            # int8 ([0,255] − 128). acc = Σ wq·(p − 128) (int32) recovers
            # 127·Σ w·p as acc + 128·Σ wq; /127 restores pixel scale. The
            # mid image re-centers (round → ≤0.5 level) so pass 2 runs
            # int8 too.
            wyq = jnp.round(wy * 127.0).astype(jnp.int8)
            wxq = jnp.round(wx * 127.0).astype(jnp.int8)
            pc = (
                jnp.clip(jnp.round(imgs), 0.0, 255.0) - 128.0
            ).astype(jnp.int8)
            acc = jnp.einsum(
                "kxiy,kyxc->kxic",
                wyq,
                pc,
                preferred_element_type=jnp.int32,
            )
            rs1 = jnp.sum(wyq.astype(jnp.int32), axis=-1)  # (k, W, out_h)
            mid127 = acc + 128 * rs1[..., None]  # 127 × true mid pixel
            midc = (
                jnp.clip(
                    jnp.round(mid127.astype(jnp.float32) / 127.0),
                    0.0,
                    255.0,
                )
                - 128.0
            ).astype(jnp.int8)  # (k, W, out_h, C)
            acc2 = jnp.einsum(
                "kijx,kxic->kijc",
                wxq,
                midc,
                preferred_element_type=jnp.int32,
            )
            rs2 = jnp.sum(wxq.astype(jnp.int32), axis=-1)  # (k, out_h, out_w)
            out = (acc2 + 128 * rs2[..., None]).astype(jnp.float32) / 127.0
            return out

        ein_dtype = jnp.bfloat16 if fast else jnp.float32
        ein_kw = (
            dict(preferred_element_type=jnp.float32)
            if fast
            else dict(precision=jax.lax.Precision.HIGHEST)
        )
        # mid[k, x, i, c] = Σ_y wy[k, x, i, y] * img[k, y, x, c]
        mid = jnp.einsum(
            "kxiy,kyxc->kxic",
            wy.astype(ein_dtype),
            imgs.astype(ein_dtype),
            **ein_kw,
        )  # (k, W, out_h, C)

        out = jnp.einsum(
            "kijx,kxic->kijc",
            wx.astype(ein_dtype),
            mid.astype(ein_dtype),
            **ein_kw,
        )  # (k, out_h, out_w, C)
        return out.astype(jnp.float32)

    if b <= chunk:
        return warp_chunk((images, ms))
    # Pad to a multiple of chunk and lax.map over chunks.
    pad = (-b) % chunk
    if pad:
        images = jnp.concatenate(
            [images, jnp.zeros((pad, h, w, c), jnp.float32)]
        )
        ms = jnp.concatenate(
            [ms, jnp.tile(jnp.eye(2, 3, dtype=jnp.float32)[None], (pad, 1, 1))]
        )
    imgs_c = images.reshape(-1, chunk, h, w, c)
    ms_c = ms.reshape(-1, chunk, 2, 3)
    out = jax.lax.map(warp_chunk, (imgs_c, ms_c))
    return out.reshape(-1, out_h, out_w, c)[:b]


@partial(jax.jit, static_argnums=(1, 2, 3))
def bilinear_resize_mxu_batch(
    images: jax.Array, out_h: int, out_w: int, fast: bool = False
) -> jax.Array:
    """Batched bilinear resize on the MXU (cv2 half-pixel convention).

    Same result as `ops.image.bilinear_resize` but as two matmul passes —
    for fixed-ratio resizes the per-image matrices are identical, so this is
    a single einsum per axis. ~10x the gather resize for big batches.
    """
    b, h, w, c = images.shape
    img = images.astype(jnp.float32)
    sy, sx = h / out_h, w / out_w
    ypos = (
        jax.lax.broadcasted_iota(jnp.float32, (out_h, 1), 0) + 0.5
    ) * sy - 0.5
    xpos = (
        jax.lax.broadcasted_iota(jnp.float32, (out_w, 1), 0) + 0.5
    ) * sx - 0.5
    # edge-clamped sampling (cv2.resize BORDER_REPLICATE at edges)
    wy = _interp_weights(jnp.clip(ypos[:, 0], 0.0, h - 1.0), h)  # (out_h, H)
    wx = _interp_weights(jnp.clip(xpos[:, 0], 0.0, w - 1.0), w)  # (out_w, W)
    if fast:
        mid = jnp.einsum(
            "iy,byxc->bixc",
            wy.astype(jnp.bfloat16),
            img.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return jnp.einsum(
            "jx,bixc->bijc",
            wx.astype(jnp.bfloat16),
            mid.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    mid = jnp.einsum(
        "iy,byxc->bixc", wy, img, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "jx,bixc->bijc", wx, mid, precision=jax.lax.Precision.HIGHEST
    )


@partial(jax.jit, static_argnums=(2, 3))
def align_crop_mxu_batch(
    images: jax.Array,
    landmarks: jax.Array,
    out_size: int = 112,
    fast: bool = False,
) -> jax.Array:
    """Batched 5-point alignment on the MXU path (landmarks (B, 5, 2))."""
    template = jnp.asarray(ARCFACE_TEMPLATE) * (out_size / 112.0)
    ms = umeyama_batch(landmarks.astype(jnp.float32), template)
    # chunk=32: ~2% faster than 16 at B=256/160² (fewer lax.map steps) with
    # a ~367 MB f32 per-pass weight working set — still far from HBM limits.
    return affine_warp_mxu_batch(images, ms, out_size, out_size, 32, fast)


@partial(jax.jit, static_argnums=(2, 3, 4))
def align_crop_mxu_window(
    frames: jax.Array,
    landmarks: jax.Array,
    out_size: int = 112,
    window: int = 160,
    fast: bool = False,
) -> jax.Array:
    """Multi-face alignment: static-window crop per slot, then warp.

    The naive crowd path repeats every frame M times and two-pass-warps
    each slot from the FULL frame, so the pass-1 interpolation weights
    scale with (frame_W × frame_H): (chunk, 256, out, 256) f32 ≈ 29 MB
    per image for 256² frames — the measured M=8 bottleneck
    (docs/PROFILE.md). This variant first extracts a static ``window``²
    region centered on each face's sampled area with per-slot
    ``lax.dynamic_slice`` (block DMA, no per-pixel gather), then warps
    from the crop — the weight tensor shrinks by (H·W)/(window²)
    (2.56× for 256²→160) and the M-fold frame ``repeat`` buffer
    disappears.

    Exactness: identical to the full-frame warp for every output pixel
    whose source sample lies inside the window; samples outside it read
    the constant-black border instead of far-away background pixels. The
    window is centered on the inverse-affine image of the output center,
    so only the corners of very large rotated faces are affected (crowd
    faces are ≤0.34 of the frame by curriculum contract —
    training/synthetic_faces.py).

    Args:
      frames: (B, H, W, C) frame batch.
      landmarks: (B, M, 5, 2) per-slot 5-point landmarks, frame coords.
      out_size, window: static sizes; window is clamped to min(H, W).
      fast: bf16 einsum operands (see ``affine_warp_mxu_batch``).

    Returns:
      (B·M, out_size, out_size, C) float32 aligned crops, slot-major per
      frame (same layout as the repeat+warp path it replaces).
    """
    b, h, w, c = frames.shape
    m = landmarks.shape[1]
    win = min(window, h, w)
    frames = frames.astype(jnp.float32)
    lm = landmarks.astype(jnp.float32).reshape(b * m, 5, 2)

    template = jnp.asarray(ARCFACE_TEMPLATE) * (out_size / 112.0)
    ms = umeyama_batch(lm, template)  # (B·M, 2, 3) source→output
    minv = jax.vmap(invert_affine)(ms)  # output→source
    ctr = jnp.array([(out_size - 1) / 2.0, (out_size - 1) / 2.0, 1.0])
    src_ctr = minv @ ctr  # (B·M, 2) sampled-region center (x, y)
    start = jnp.round(src_ctr - (win - 1) / 2.0).astype(jnp.int32)
    x0 = jnp.clip(start[:, 0], 0, w - win).reshape(b, m)
    y0 = jnp.clip(start[:, 1], 0, h - win).reshape(b, m)

    def slice_one(frame, yy, xx):
        return jax.lax.dynamic_slice(frame, (yy, xx, 0), (win, win, c))

    crops = jax.vmap(  # over frames
        jax.vmap(slice_one, in_axes=(None, 0, 0))  # over slots
    )(frames, y0, x0).reshape(b * m, win, win, c)

    # Cropping translates source coords by -(x0, y0): dst = A·src + t
    # becomes dst = A·src' + (A·offset + t).
    off = jnp.stack([x0.reshape(-1), y0.reshape(-1)], -1).astype(jnp.float32)
    ms_c = ms.at[:, :, 2].add(jnp.einsum("bij,bj->bi", ms[:, :, :2], off))
    return affine_warp_mxu_batch(crops, ms_c, out_size, out_size, 32, fast)
