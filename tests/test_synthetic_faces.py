"""Curriculum generator v2: shapes, GT consistency, identity conditioning."""

import numpy as np
import pytest

from facerecognition_tpu.training.synthetic_faces import (
    MAX_GT,
    RANGES_V3,
    RANGES_V4,
    SCENE_RANGES,
    SceneRanges,
    identity_dataset,
    render_aligned_identity_sample,
    render_scene,
    sample_identity,
    scene_batch,
)


class TestScenes:
    def test_batch_shapes_and_ranges(self, rng):
        imgs, boxes, lms, valid = scene_batch(rng, 8, 96, max_faces=2)
        assert imgs.shape == (8, 96, 96, 3)
        assert boxes.shape == (8, MAX_GT, 4)
        assert lms.shape == (8, MAX_GT, 5, 2)
        assert valid.shape == (8, MAX_GT)
        assert imgs.min() >= 0 and imgs.max() <= 255

    def test_landmarks_inside_gt_box(self, rng):
        """Eyes/nose/mouth must sit within (a slightly padded) head box —
        the detector regresses landmarks relative to the box."""
        checked = 0
        for _ in range(20):
            img, boxes, lms, valid = render_scene(rng, 128, max_faces=1)
            for j in range(MAX_GT):
                if not valid[j]:
                    continue
                x1, y1, x2, y2 = boxes[j]
                pad = 0.25 * (x2 - x1)
                assert (lms[j, :, 0] > x1 - pad).all()
                assert (lms[j, :, 0] < x2 + pad).all()
                assert (lms[j, :, 1] > y1 - pad).all()
                assert (lms[j, :, 1] < y2 + pad).all()
                # canonical ordering: left eye left of right eye (up to
                # in-plane rotation ±22°, x-order is preserved)
                assert lms[j, 0, 0] < lms[j, 1, 0]
                checked += 1
        assert checked >= 10

    def test_face_probability(self, rng):
        _, _, _, valid = scene_batch(rng, 40, 64, p_face=0.0)
        assert not valid.any()
        _, _, _, valid = scene_batch(rng, 40, 64, p_face=1.0)
        assert valid[:, 0].mean() > 0.9  # placement may rarely fail

    def test_multi_face_no_heavy_overlap(self, rng):
        found = 0
        for _ in range(30):
            _, boxes, _, valid = render_scene(rng, 128, max_faces=3, p_face=1.0)
            n = int(valid.sum())
            if n < 2:
                continue
            found += 1
            b = boxes[valid]
            for i in range(n):
                for j in range(i + 1, n):
                    ix = max(0, min(b[i, 2], b[j, 2]) - max(b[i, 0], b[j, 0]))
                    iy = max(0, min(b[i, 3], b[j, 3]) - max(b[i, 1], b[j, 1]))
                    inter = ix * iy
                    area = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
                    assert inter / area < 0.35
        assert found >= 3


class TestIdentities:
    def test_identity_determinism(self):
        a = sample_identity(np.random.default_rng(7))
        b = sample_identity(np.random.default_rng(7))
        assert np.allclose(a.skin, b.skin) and a.aspect == b.aspect

    def test_aligned_sample_shape(self, rng):
        p = sample_identity(rng)
        s = render_aligned_identity_sample(rng, p, 112)
        assert s.shape == (112, 112, 3)
        assert s.min() >= 0 and s.max() <= 255

    def test_identity_dataset_layout(self):
        imgs, labels = identity_dataset(4, 3, out_size=64, seed=1, workers=2)
        assert imgs.shape == (12, 64, 64, 3) and imgs.dtype == np.uint8
        assert (np.bincount(labels) == 3).all()
        # deterministic across calls (seeded per (seed, id, k))
        imgs2, _ = identity_dataset(4, 3, out_size=64, seed=1, workers=4)
        np.testing.assert_array_equal(imgs, imgs2)

    def test_default_ranges_are_v3_and_stream_stable(self):
        """Passing no ranges must sample the v3 envelope with the exact
        same RNG draw sequence as ranges=RANGES_V3 (seed-pinned evals and
        the held-out-seed quality numbers depend on this)."""
        assert SceneRanges() == RANGES_V3
        assert SCENE_RANGES["v3"] is RANGES_V3
        assert SCENE_RANGES["v4"] is RANGES_V4
        a = render_scene(np.random.default_rng(11), 96, 2, 0.92)
        b = render_scene(np.random.default_rng(11), 96, 2, 0.92, ranges=RANGES_V3)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_v4_ranges_widen_pose_and_illumination_only(self):
        """v4 is a strict superset on rotation/fraction/photometrics so a
        v3-warm-started detector keeps its in-distribution competence; the
        appearance/background/degradation OOD axes are untouched by it."""
        assert RANGES_V4.rot > RANGES_V3.rot
        assert RANGES_V4.frac_single[0] < RANGES_V3.frac_single[0]
        assert RANGES_V4.frac_single[1] > RANGES_V3.frac_single[1]
        assert RANGES_V4.gain[0] < RANGES_V3.gain[0] < RANGES_V3.gain[1] < RANGES_V4.gain[1]
        assert RANGES_V4.bias[0] < RANGES_V3.bias[0] < RANGES_V3.bias[1] < RANGES_V4.bias[1]
        assert RANGES_V4.cast[0] < RANGES_V3.cast[0] < RANGES_V3.cast[1] < RANGES_V4.cast[1]
        # v4 must cover the OOD pose/illumination family extremes
        # (training/ood_faces.py: rot <=50, frac 0.10..0.90, gain
        # 0.30..1.80, bias +-80, cast 0.70..1.30).
        assert RANGES_V4.rot >= 50
        assert RANGES_V4.frac_single[0] <= 0.10 and RANGES_V4.frac_single[1] >= 0.90
        assert RANGES_V4.gain[0] <= 0.30 and RANGES_V4.gain[1] >= 1.80
        assert RANGES_V4.bias[0] <= -80 and RANGES_V4.bias[1] >= 80
        assert RANGES_V4.cast[0] <= 0.70 and RANGES_V4.cast[1] >= 1.30
        assert RANGES_V4.vignette[1] >= 0.45
        # scene contract holds under the wide envelope
        imgs, boxes, lms, valid = scene_batch(
            np.random.default_rng(12), 4, 96, 2, 0.92, ranges=RANGES_V4
        )
        assert imgs.shape == (4, 96, 96, 3)
        assert imgs.min() >= 0 and imgs.max() <= 255

    @pytest.mark.slow
    def test_pixel_separability(self):
        """Same-identity samples are closer in pixel space than
        cross-identity ones on average — the signal recognition training
        amplifies."""
        imgs, labels = identity_dataset(6, 6, out_size=64, seed=3)
        x = imgs.reshape(len(imgs), -1).astype(np.float32)
        x = (x - x.mean(1, keepdims=True)) / (x.std(1, keepdims=True) + 1e-6)
        d = ((x[:, None] - x[None]) ** 2).mean(-1)
        same = d[labels[:, None] == labels[None]]
        diff = d[labels[:, None] != labels[None]]
        assert same.mean() < diff.mean()
