"""Golden tests for core image ops vs OpenCV / closed-form references."""

import numpy as np
import pytest

import jax.numpy as jnp

from facerecognition_tpu.ops.umeyama import ARCFACE_TEMPLATE, umeyama, invert_affine
from facerecognition_tpu.ops.image import (
    affine_warp,
    align_crop,
    bilinear_resize,
    crop_with_margin,
    normalize_imagenet_style,
    rgb_to_grayscale,
)

cv2 = pytest.importorskip("cv2")


class TestUmeyama:
    def test_recovers_known_similarity(self, rng):
        # Build a known similarity transform and check recovery.
        theta = 0.3
        s = 1.7
        t = np.array([5.0, -3.0])
        rot = np.array(
            [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
        )
        src = rng.normal(size=(5, 2)).astype(np.float32) * 20
        dst = (s * src @ rot.T + t).astype(np.float32)
        m = np.asarray(umeyama(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(m[:, :2], s * rot, atol=1e-4)
        np.testing.assert_allclose(m[:, 2], t, atol=1e-3)

    def test_matches_cv2_estimate_affine_partial(self, rng):
        # cv2.estimateAffinePartial2D with full consensus == least-squares
        # similarity, same as skimage SimilarityTransform.estimate.
        src = (rng.normal(size=(5, 2)) * 30 + 56).astype(np.float32)
        dst = ARCFACE_TEMPLATE
        m_ours = np.asarray(umeyama(jnp.asarray(src), jnp.asarray(dst)))
        m_cv, _ = cv2.estimateAffinePartial2D(
            src, dst, method=cv2.LMEDS, refineIters=100
        )
        np.testing.assert_allclose(m_ours, m_cv, atol=1e-3)

    def test_invert_affine(self, rng):
        m = np.array([[1.2, 0.3, 4.0], [-0.3, 1.2, -2.0]], dtype=np.float32)
        minv = np.asarray(invert_affine(jnp.asarray(m)))
        a = np.vstack([m, [0, 0, 1]])
        ainv = np.vstack([minv, [0, 0, 1]])
        np.testing.assert_allclose(a @ ainv, np.eye(3), atol=1e-5)


class TestAffineWarp:
    def test_identity(self, face_image):
        m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        out = np.asarray(affine_warp(jnp.asarray(face_image), m, 160, 160))
        np.testing.assert_allclose(out, face_image.astype(np.float32), atol=1e-3)

    def test_matches_cv2_warp_affine(self, face_image):
        theta = 0.2
        m = np.array(
            [
                [1.1 * np.cos(theta), -1.1 * np.sin(theta), 8.0],
                [1.1 * np.sin(theta), 1.1 * np.cos(theta), -5.0],
            ],
            dtype=np.float32,
        )
        ours = np.asarray(affine_warp(jnp.asarray(face_image), jnp.asarray(m), 112, 112))
        ref = cv2.warpAffine(
            face_image.astype(np.float32), m, (112, 112), flags=cv2.INTER_LINEAR
        )
        # Interior pixels should match cv2 closely (border handling may differ
        # by <1px at edges); compare the interior.
        np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=0.5)

    def test_align_crop_shape_and_template(self, face_image, rng):
        # Landmarks exactly at template → warp ≈ identity region copy.
        lm = jnp.asarray(ARCFACE_TEMPLATE)
        out = align_crop(jnp.asarray(face_image), lm, 112)
        assert out.shape == (112, 112, 3)
        np.testing.assert_allclose(
            np.asarray(out), face_image[:112, :112].astype(np.float32), atol=1e-2
        )


class TestResizeAndMisc:
    def test_resize_matches_cv2(self, face_image):
        ours = np.asarray(bilinear_resize(jnp.asarray(face_image), 112, 112))
        ref = cv2.resize(
            face_image.astype(np.float32), (112, 112), interpolation=cv2.INTER_LINEAR
        )
        assert np.mean(np.abs(ours - ref)) < 0.5

    def test_grayscale_matches_cv2(self, face_image):
        ours = np.asarray(rgb_to_grayscale(jnp.asarray(face_image)))
        ref = cv2.cvtColor(face_image, cv2.COLOR_RGB2GRAY).astype(np.float32)
        assert np.mean(np.abs(ours - ref)) < 0.6  # cv2 rounds to uint8

    def test_normalize(self, face_image):
        out = np.asarray(normalize_imagenet_style(jnp.asarray(face_image)))
        assert out.min() >= -1.0 and out.max() <= 1.0
        np.testing.assert_allclose(
            out, (face_image / 255.0 - 0.5) / 0.5, atol=1e-6
        )

    def test_crop_with_margin(self, face_image):
        bbox = jnp.array([40.0, 40.0, 120.0, 120.0])
        out = crop_with_margin(jnp.asarray(face_image), bbox, margin=0.2, target_size=112)
        assert out.shape == (112, 112, 3)
        # Center of crop should equal center of bbox region.
        ref_center = face_image[79:81, 79:81].mean()
        got_center = np.asarray(out)[55:57, 55:57].mean()
        assert abs(ref_center - got_center) < 40  # loose: interpolation

    def test_crop_with_margin_matches_cv2_golden(self, face_image):
        """Pin the reference crop_face semantics: integer slice + cv2.resize
        (half-pixel centers). Integer-valued crop bounds isolate the resize
        convention."""
        # bbox (30,40,110,120), margin 0.25 → crop [10,130)x[20,140), 120².
        bbox = jnp.array([30.0, 40.0, 110.0, 120.0])
        out = np.asarray(
            crop_with_margin(
                jnp.asarray(face_image), bbox, margin=0.25, target_size=112
            )
        )
        ref = cv2.resize(
            face_image[20:140, 10:130].astype(np.float32),
            (112, 112),
            interpolation=cv2.INTER_LINEAR,
        )
        assert np.mean(np.abs(out - ref)) < 1.0
        assert np.max(np.abs(out - ref)) < 30  # isolated interp rounding
