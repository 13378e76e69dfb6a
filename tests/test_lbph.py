"""LBPH tests: numpy-loop golden parity + recognition behavior.

Mirrors the reference's committed LBPH unit test strategy
(models/lbphmodel/test_lbph_logic.py: synthetic striped classes) plus a
strict golden test of the vectorized LBP against an independent loop
transcription of OpenCV's elbp/spatial_histogram.
"""

import math
import os

import numpy as np
import pytest
import jax.numpy as jnp

from facerecognition_tpu.models.lbph import (
    LBPHModel,
    chi2_alt_distances,
    lbp_code_image,
    lbph_features,
    spatial_histogram,
)


def _ref_elbp(src: np.ndarray, radius=1, neighbors=8) -> np.ndarray:
    """Loop transcription of OpenCV elbp_ (bilinear circular LBP)."""
    src = src.astype(np.float32)
    h, w = src.shape
    dst = np.zeros((h - 2 * radius, w - 2 * radius), np.int32)
    for n in range(neighbors):
        x = radius * math.cos(2.0 * math.pi * n / neighbors)
        y = -radius * math.sin(2.0 * math.pi * n / neighbors)
        fx, fy = math.floor(x), math.floor(y)
        cx, cy = math.ceil(x), math.ceil(y)
        tx, ty = x - fx, y - fy
        w1 = (1 - tx) * (1 - ty)
        w2 = tx * (1 - ty)
        w3 = (1 - tx) * ty
        w4 = tx * ty
        for i in range(radius, h - radius):
            for j in range(radius, w - radius):
                t = (
                    w1 * src[i + fy, j + fx]
                    + w2 * src[i + fy, j + cx]
                    + w3 * src[i + cy, j + fx]
                    + w4 * src[i + cy, j + cx]
                )
                c = src[i, j]
                if t > c or abs(t - c) < np.finfo(np.float32).eps:
                    dst[i - radius, j - radius] |= 1 << n
    return dst


def _synthetic_faces(rng, n_classes=3, per_class=5, size=60):
    """Random noise + per-class stripe pattern (reference test_lbph_logic.py:18-33)."""
    images, labels = [], []
    for c in range(n_classes):
        for _ in range(per_class):
            img = rng.integers(0, 100, (size, size)).astype(np.uint8)
            img[:: c + 2, :] = 220  # class-specific stripe period
            images.append(img)
            labels.append(c)
    return np.stack(images), np.array(labels)


class TestLBPCore:
    def test_code_image_matches_loop_reference(self, rng):
        img = rng.integers(0, 256, (20, 24)).astype(np.uint8)
        ours = np.asarray(lbp_code_image(jnp.asarray(img)))
        ref = _ref_elbp(img)
        np.testing.assert_array_equal(ours, ref)

    def test_code_range(self, rng):
        img = rng.integers(0, 256, (30, 30)).astype(np.uint8)
        code = np.asarray(lbp_code_image(jnp.asarray(img)))
        assert code.shape == (28, 28)
        assert code.min() >= 0 and code.max() <= 255

    def test_spatial_histogram_layout(self, rng):
        code = rng.integers(0, 256, (98, 98)).astype(np.int32)
        hist = np.asarray(spatial_histogram(jnp.asarray(code), 8, 8, 256))
        assert hist.shape == (8 * 8 * 256,)
        # Cell (0,0) histogram must equal a direct bincount of the top-left
        # 12x12 (98//8=12) block, normalized by 144.
        cell = code[:12, :12].reshape(-1)
        ref = np.bincount(cell, minlength=256) / 144.0
        np.testing.assert_allclose(hist[:256], ref, atol=1e-6)

    @pytest.mark.parametrize(
        "radius,neighbors",
        [(1, 8), (2, 8), (3, 8), (1, 4), (2, 4), (1, 10), (2, 16)],
    )
    def test_code_image_golden_matrix(self, rng, radius, neighbors):
        """Golden parity across the cv2.face constructor's parameter space
        (reference train_lbph.py:24-36 exposes radius/neighbors)."""
        img = rng.integers(0, 256, (18 + 2 * radius, 22 + 2 * radius)).astype(
            np.uint8
        )
        ours = np.asarray(lbp_code_image(jnp.asarray(img), radius, neighbors))
        ref = _ref_elbp(img, radius, neighbors)
        np.testing.assert_array_equal(ours, ref)
        assert ours.max() < 2**neighbors

    @pytest.mark.parametrize("grid_x,grid_y", [(4, 6), (7, 3), (8, 8)])
    def test_spatial_histogram_nonsquare_grids(self, rng, grid_x, grid_y):
        code = rng.integers(0, 256, (59, 47)).astype(np.int32)
        hist = np.asarray(
            spatial_histogram(jnp.asarray(code), grid_x, grid_y, 256)
        )
        assert hist.shape == (grid_x * grid_y * 256,)
        ch, cw = 59 // grid_y, 47 // grid_x
        # golden: loop bincount over every cell (row-major concat, OpenCV
        # spatial_histogram order)
        for cy in range(grid_y):
            for cx in range(grid_x):
                cell = code[cy * ch : (cy + 1) * ch, cx * cw : (cx + 1) * cw]
                ref = np.bincount(cell.reshape(-1), minlength=256) / (ch * cw)
                got = hist[(cy * grid_x + cx) * 256 : (cy * grid_x + cx + 1) * 256]
                np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_recorded_golden_fixture(self):
        """Numeric-drift tripwire: features + distances for a fixed-seed
        image must match the committed recording exactly (regenerate with
        tests/fixtures/make_lbph_golden.py if the algorithm intentionally
        changes)."""
        path = os.path.join(
            os.path.dirname(__file__), "fixtures", "lbph_golden.npz"
        )
        rec = np.load(path)
        img = rec["image"]
        feats = np.asarray(
            lbph_features(jnp.asarray(img), 2, 8, 5, 4, 256)
        )
        np.testing.assert_allclose(feats, rec["features"], atol=1e-6)
        d = np.asarray(
            chi2_alt_distances(jnp.asarray(feats), jnp.asarray(rec["gallery"]))
        )
        np.testing.assert_allclose(d, rec["distances"], rtol=1e-5)

    def test_chi2_alt(self, rng):
        q = np.abs(rng.normal(size=64)).astype(np.float32)
        g = np.abs(rng.normal(size=(5, 64))).astype(np.float32)
        d = np.asarray(chi2_alt_distances(jnp.asarray(q), jnp.asarray(g)))
        ref = 2 * ((q - g) ** 2 / np.where(q + g > 0, q + g, 1)).sum(1)
        np.testing.assert_allclose(d, ref, rtol=1e-4)
        # identical histogram → 0
        same = np.asarray(chi2_alt_distances(jnp.asarray(q), jnp.asarray(q[None])))
        np.testing.assert_allclose(same, 0.0, atol=1e-6)


class TestLBPHModel:
    def test_train_predict_roundtrip(self, rng):
        images, labels = _synthetic_faces(rng)
        model = LBPHModel()
        model.train(images, labels)
        # Predict on noisy variants of training images — same stripes.
        correct = 0
        for c in range(3):
            img = rng.integers(0, 100, (60, 60)).astype(np.uint8)
            img[:: c + 2, :] = 220
            pred, conf = model.predict(img)
            assert conf >= 0
            correct += pred == c
        assert correct >= 2  # stripes dominate the histogram

    def test_nondefault_neighbors_histograms_not_empty(self, rng):
        """LBPHModel(neighbors=16) must histogram over 2^16 bins, not the
        256 default (which silently one-hot-dropped codes >= 256 and left
        histograms nearly empty)."""
        images, labels = _synthetic_faces(rng)
        model = LBPHModel(neighbors=16, grid_x=2, grid_y=2)
        model.train(images, labels)
        assert model.histograms.shape[1] == 2 * 2 * (2**16)
        # Cell histograms still sum to ~1 (all pixels binned somewhere).
        per_cell = model.histograms[0].reshape(4, -1).sum(axis=1)
        np.testing.assert_allclose(per_cell, 1.0, atol=1e-4)
        pred, conf = model.predict(images[0])
        assert pred == labels[0] and conf < 1e-6  # exact self-match

    def test_train_validates_before_mutating(self, rng):
        images, labels = _synthetic_faces(rng)
        model = LBPHModel()
        model.train(images, labels)
        with pytest.raises(ValueError):
            model.train(images, labels[:2])
        # state intact from the first train
        assert len(model.histograms) == len(model.labels) == len(images)

    def test_threshold_unknown(self, rng):
        images, labels = _synthetic_faces(rng)
        model = LBPHModel(threshold=1e-9)
        model.train(images, labels)
        pred, conf = model.predict(images[0] // 2 + 10)
        assert pred == -1  # everything above the impossible threshold

    def test_exact_match_distance_zero(self, rng):
        images, labels = _synthetic_faces(rng)
        model = LBPHModel()
        model.train(images, labels)
        pred, conf = model.predict(images[0])
        assert pred == labels[0]
        assert conf < 1e-5

    def test_batch_predict_matches_single(self, rng):
        images, labels = _synthetic_faces(rng)
        model = LBPHModel()
        model.train(images, labels)
        test = images[:4]
        bl, bc = model.predict_batch(test)
        for i in range(4):
            sl, sc = model.predict(test[i])
            assert bl[i] == sl
            assert abs(bc[i] - sc) < 1e-4

    def test_save_load(self, rng, tmp_path):
        images, labels = _synthetic_faces(rng)
        model = LBPHModel(threshold=80.0)
        model.train(images, labels)
        path = tmp_path / "lbph.npz"
        model.save(path)
        loaded = LBPHModel.load(path)
        assert loaded.threshold == 80.0
        p1 = model.predict(images[3])
        p2 = loaded.predict(images[3])
        assert p1[0] == p2[0] and abs(p1[1] - p2[1]) < 1e-6

    def test_update_incremental(self, rng):
        images, labels = _synthetic_faces(rng)
        model = LBPHModel()
        model.train(images[:10], labels[:10])
        model.update(images[10:], labels[10:])
        assert len(model.labels) == len(labels)
        pred, _ = model.predict(images[12])
        assert pred == labels[12]

    def test_predict_topk(self, rng):
        images, labels = _synthetic_faces(rng)
        model = LBPHModel()
        model.train(images, labels)
        topk = model.predict_topk(images[0], k=3)
        assert len(topk) == 3
        assert topk[0][0] == labels[0]  # exact match wins
        assert topk[0][1] < 1e-5
        # distances sorted ascending
        ds = [d for _, d in topk]
        assert ds == sorted(ds)
        # k > n_identities clips
        assert len(model.predict_topk(images[0], k=99)) == 3

    def test_chunked_paths_match_unchunked(self, rng):
        """Featurize/predict chunking (the reference-scale memory guard,
        models/lbph.py _compute_histograms/predict_batch) is exact: any
        chunk size yields identical histograms, labels, and confidences."""
        images, labels = _synthetic_faces(rng)
        model = LBPHModel()
        model.train(images, labels)

        whole = model._compute_histograms(images)
        for chunk in (1, 4, 7):  # ragged tails included
            np.testing.assert_array_equal(
                model._compute_histograms(images, chunk=chunk), whole
            )

        bl, bc = model.predict_batch(images)
        for probe_chunk in (1, 4, 7):
            cl, cc = model.predict_batch(images, probe_chunk=probe_chunk)
            np.testing.assert_array_equal(cl, bl)
            np.testing.assert_allclose(cc, bc, rtol=1e-6)
