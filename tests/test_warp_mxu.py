"""Two-pass MXU warp vs exact gather warp parity."""

import numpy as np
import jax.numpy as jnp

from facerecognition_tpu.ops.image import affine_warp, align_crop_batch
from facerecognition_tpu.ops.umeyama import ARCFACE_TEMPLATE
from facerecognition_tpu.ops.warp_mxu import affine_warp_mxu_batch, align_crop_mxu_batch


def _smooth(rng, shape):
    """Low-frequency random image (separable box-blurred noise)."""
    img = rng.normal(size=shape) * 60 + 128
    k = np.ones(7) / 7
    for ax in (0, 1):
        img = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), ax, img
        )
    return img.astype(np.float32)


def test_identity_warp_exact(rng):
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.float32)
    m = jnp.tile(jnp.eye(2, 3), (1, 1, 1))
    out = affine_warp_mxu_batch(jnp.asarray(img)[None], m, 64, 64)
    np.testing.assert_allclose(np.asarray(out)[0], img, atol=1e-3)


def test_matches_gather_warp_on_smooth(rng):
    img = _smooth(rng, (96, 96, 3))
    theta, s = 0.2, 1.1
    m = np.array(
        [
            [s * np.cos(theta), -s * np.sin(theta), 6.0],
            [s * np.sin(theta), s * np.cos(theta), -3.0],
        ],
        np.float32,
    )
    exact = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(m), 64, 64))
    fast = np.asarray(
        affine_warp_mxu_batch(jnp.asarray(img)[None], jnp.asarray(m)[None], 64, 64)
    )[0]
    # Sub-pixel shear approximation: tight on smooth content.
    assert np.abs(exact - fast).mean() < 0.2
    assert np.abs(exact - fast).max() < 8.0


def test_align_crop_mxu_matches_exact(rng):
    imgs = np.stack([_smooth(rng, (160, 160, 3)) for _ in range(3)])
    theta = 0.1
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    lm = np.tile((ARCFACE_TEMPLATE @ rot.T) * 1.2 + 10.0, (3, 1, 1)).astype(
        np.float32
    )
    exact = np.asarray(align_crop_batch(jnp.asarray(imgs), jnp.asarray(lm), 112))
    fast = np.asarray(align_crop_mxu_batch(jnp.asarray(imgs), jnp.asarray(lm), 112))
    assert np.abs(exact - fast).mean() < 0.2


def test_fast_modes_bounded_pixel_error(rng):
    """bf16 (True) and "int8" fast modes stay within ~2 intensity levels of
    the exact f32 path on uint8-valued content (the documented contract in
    ops/warp_mxu.py; int8 additionally requantizes the inter-pass image
    once). int8 measured SLOWER end-to-end on the current backend — kept
    as an exactness-characterized mode, so the bound is pinned here."""
    imgs = np.stack(
        [_smooth(rng, (160, 160, 3)) for _ in range(3)]
    ).round()  # integer-valued uint8 content (the int8-mode requirement)
    theta = 0.25
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    lm = np.tile((ARCFACE_TEMPLATE @ rot.T) * 1.1 + 12.0, (3, 1, 1)).astype(
        np.float32
    )
    exact = np.asarray(
        align_crop_mxu_batch(jnp.asarray(imgs), jnp.asarray(lm), 112, False)
    )
    for mode in (True, "int8"):
        fast = np.asarray(
            align_crop_mxu_batch(jnp.asarray(imgs), jnp.asarray(lm), 112, mode)
        )
        err = np.abs(exact - fast)
        assert err.max() < 2.5, (mode, err.max())
        assert err.mean() < 0.3, (mode, err.mean())


def test_chunked_batch_equals_small_batch(rng):
    # batch > chunk path (chunk=16 → use 18 images)
    imgs = jnp.asarray(rng.integers(0, 256, (18, 48, 48, 3)).astype(np.float32))
    ms = jnp.tile(
        jnp.asarray(
            np.array([[0.9, 0.1, 2.0], [-0.1, 0.9, 1.0]], np.float32)
        )[None],
        (18, 1, 1),
    )
    full = np.asarray(affine_warp_mxu_batch(imgs, ms, 32, 32))
    one = np.asarray(affine_warp_mxu_batch(imgs[:1], ms[:1], 32, 32))
    np.testing.assert_allclose(full[0], one[0], atol=1e-3)
    assert full.shape == (18, 32, 32, 3)


def test_window_crop_matches_full_frame_warp(rng):
    """Crowd-path window warp == repeat+full-frame warp when every
    sampled pixel lies inside the 160² window (the crowd contract:
    faces <= 0.34 of the frame)."""
    from facerecognition_tpu.ops.warp_mxu import align_crop_mxu_window

    b, m = 2, 3
    imgs = np.stack([_smooth(rng, (256, 256, 3)) for _ in range(b)])
    theta = 0.25
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    # Small faces (template * 0.7 ≈ 66px spread) scattered over the frame.
    centers = rng.uniform(60, 196, size=(b, m, 1, 2)).astype(np.float32)
    base = (np.asarray(ARCFACE_TEMPLATE) - np.asarray(ARCFACE_TEMPLATE).mean(0)) @ rot.T
    lm = (base[None, None] * 0.7 + centers).astype(np.float32)

    full = np.asarray(
        align_crop_mxu_batch(
            jnp.repeat(jnp.asarray(imgs), m, axis=0),
            jnp.asarray(lm.reshape(b * m, 5, 2)),
            112,
        )
    )
    win = np.asarray(
        align_crop_mxu_window(jnp.asarray(imgs), jnp.asarray(lm), 112, 160)
    )
    assert win.shape == (b * m, 112, 112, 3)
    np.testing.assert_allclose(win, full, atol=1e-2)


def test_window_crop_clamps_at_frame_edge(rng):
    """A face whose window would extend past the frame boundary still
    aligns correctly (the slice start is clamped, the affine offset
    compensates)."""
    from facerecognition_tpu.ops.warp_mxu import align_crop_mxu_window

    imgs = np.stack([_smooth(rng, (256, 256, 3))])
    # Face centered near the (0, 0) corner.
    base = np.asarray(ARCFACE_TEMPLATE) - np.asarray(ARCFACE_TEMPLATE).mean(0)
    lm = (base * 0.7 + 40.0).astype(np.float32)[None, None]
    full = np.asarray(
        align_crop_mxu_batch(jnp.asarray(imgs), jnp.asarray(lm[:, 0]), 112)
    )
    win = np.asarray(
        align_crop_mxu_window(jnp.asarray(imgs), jnp.asarray(lm), 112, 160)
    )
    np.testing.assert_allclose(win, full, atol=1e-2)


def test_mxu_resize_matches_gather_resize(rng):
    import jax.numpy as jnp

    from facerecognition_tpu.ops.image import bilinear_resize
    from facerecognition_tpu.ops.warp_mxu import bilinear_resize_mxu_batch

    x = jnp.asarray(rng.integers(0, 256, (3, 96, 80, 3)).astype(np.float32))
    down = np.asarray(bilinear_resize_mxu_batch(x, 64, 64))
    ref = np.asarray(bilinear_resize(x, 64, 64))
    np.testing.assert_allclose(down, ref, atol=1e-3)
    up = np.asarray(bilinear_resize_mxu_batch(x, 128, 144))
    ref_up = np.asarray(bilinear_resize(x, 128, 144))
    np.testing.assert_allclose(up, ref_up, atol=1e-3)
